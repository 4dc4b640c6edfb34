from data_ingestion_lambda_spark.cli import main

raise SystemExit(main())
