from ticdc_spark.plans.schema_registry import (  # noqa: F401
    SCHEMA_VERSIONS,
    schema_registry_df,
    asof_bind_schema,
)
