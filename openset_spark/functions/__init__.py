from openset_spark.functions import time as time_fns  # noqa: F401
from openset_spark.functions import text as text_fns  # noqa: F401
from openset_spark.functions import vector as vector_fns  # noqa: F401
