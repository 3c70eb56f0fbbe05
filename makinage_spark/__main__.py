from makinage_spark.cli import main

raise SystemExit(main())
