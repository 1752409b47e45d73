from hadoop_search_spark.plans.parser import parse_query  # noqa: F401
from hadoop_search_spark.plans.planner import SearchEngine  # noqa: F401
