from hadoop_search_spark.functions.tokenize import (  # noqa: F401
    DELIM_CHARS,
    DELIM_REGEX,
    tokenize_with_positions,
)
from hadoop_search_spark.functions.porter import porter_stem, porter_stem_udf  # noqa: F401
