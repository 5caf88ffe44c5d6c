from cognee_graphdb_spark.cli import main

raise SystemExit(main())
