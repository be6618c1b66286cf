from scrape_spark.functions.urlkeys import (  # noqa: F401
    clean_url,
    clean_url_py,
    hostname_col,
    url_key,
    url_key_py,
)
