"""``module:function`` loader — the reference's entire UDF/extension mechanism
(makinage/util.py:5-23, used for operator factories, partition selectors,
timestamp mappers, pre/post transforms; docs/configuration.rst:43,45,55).

Same observable behavior: import by dotted path, optional keyword partial
application; errors name the spec that failed.
"""

from __future__ import annotations

import functools
import importlib
from collections.abc import Callable
from typing import Any


def import_function(spec: str, kwargs: dict[str, Any] | None = None) -> Callable:
    """Load ``"package.module:function"`` and partially apply ``kwargs``.

    >>> mul = import_function("operator:mul", {"b": 3})  # doctest: +SKIP
    """
    if ":" not in spec:
        raise ValueError(f"function spec must be 'module:function', got {spec!r}")
    module_name, _, func_name = spec.partition(":")
    try:
        module = importlib.import_module(module_name)
    except ImportError as e:
        raise ImportError(f"cannot import module {module_name!r} for spec {spec!r}") from e
    try:
        fn = getattr(module, func_name)
    except AttributeError as e:
        raise AttributeError(f"module {module_name!r} has no attribute {func_name!r}") from e
    if kwargs:
        return functools.partial(fn, **kwargs)
    return fn
