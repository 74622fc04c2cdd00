"""Sources: the `ibmmq` DataSource (Python Data Source API) and the
file-backed fake MQ broker used for tests and driver checks.

The real-broker adapter (pymqi) is an optional drop-in behind the same
`MQClient` interface; this container has no broker, so the fake is the
default provider (SURVEY.md §5.2 item 3).
"""

from spark_ibm_mq_spark.sources.fake_mq import FakeMQBroker
from spark_ibm_mq_spark.sources.mq import SCHEMA as MQ_SCHEMA
from spark_ibm_mq_spark.sources.mq import IBMMQDataSource, register_ibmmq

__all__ = ["FakeMQBroker", "IBMMQDataSource", "MQ_SCHEMA", "register_ibmmq"]
