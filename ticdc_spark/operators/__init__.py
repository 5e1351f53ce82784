from ticdc_spark.operators.table_filter import table_filter_predicate, apply_table_filter  # noqa: F401
from ticdc_spark.operators.event_filter import apply_event_filters  # noqa: F401
from ticdc_spark.operators.expr_filter import apply_expr_filter  # noqa: F401
from ticdc_spark.operators.update_split import split_updates  # noqa: F401
from ticdc_spark.operators.compaction import compact_changelog  # noqa: F401
from ticdc_spark.operators.ordering import with_sort_keys, ordered  # noqa: F401
from ticdc_spark.operators.column_selector import select_columns  # noqa: F401
from ticdc_spark.operators.projections import only_updated_columns, delete_handle_key_only  # noqa: F401
from ticdc_spark.operators.routing import route, PARTITIONERS  # noqa: F401
from ticdc_spark.operators.checksum import with_row_checksum  # noqa: F401
