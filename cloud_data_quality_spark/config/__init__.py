from cloud_data_quality_spark.config.model import (  # noqa: F401
    Entity,
    EntityColumn,
    ReferenceColumns,
    RowFilter,
    Rule,
    RuleBinding,
    RuleType,
)
from cloud_data_quality_spark.config.loader import ConfigRegistry, load_configs  # noqa: F401
