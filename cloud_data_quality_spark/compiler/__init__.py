from cloud_data_quality_spark.compiler.binding import (  # noqa: F401
    CompiledBinding,
    CompiledRule,
    compile_binding,
)
from cloud_data_quality_spark.compiler.dialect import bq_to_spark_sql  # noqa: F401
