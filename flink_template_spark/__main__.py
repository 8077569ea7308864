from flink_template_spark.cli import main

raise SystemExit(main())
