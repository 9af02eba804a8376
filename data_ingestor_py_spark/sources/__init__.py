from data_ingestor_py_spark.sources.generator import change_events, repo_files_seed  # noqa: F401
