from cloud_data_quality_spark.engine.runner import DqEngine, RunResult  # noqa: F401
from cloud_data_quality_spark.engine.summary import SUMMARY_SCHEMA  # noqa: F401
