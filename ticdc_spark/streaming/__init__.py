from ticdc_spark.streaming.changefeed import Changefeed  # noqa: F401
from ticdc_spark.streaming.barrier import split_batch_at_ddl  # noqa: F401
