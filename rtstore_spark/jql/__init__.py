from rtstore_spark.jql.parser import parse_jql  # noqa: F401
from rtstore_spark.jql.compiler import jql_query  # noqa: F401
