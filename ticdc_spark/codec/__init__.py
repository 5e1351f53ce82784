from ticdc_spark.codec.canal_json import encode_canal_json  # noqa: F401
from ticdc_spark.codec.csv_codec import encode_csv  # noqa: F401
from ticdc_spark.codec.open_protocol import encode_open_protocol  # noqa: F401
from ticdc_spark.codec.debezium import encode_debezium  # noqa: F401
