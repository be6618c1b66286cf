"""spark-submit entry point (north rule: `spark-submit --py-files` launch).

    spark-submit --master <cluster> \
        --py-files dist/scrape_spark.zip \
        tools/submit_entry.py crawl --state /path/state --corpus ... seeds...

Every CLI surface (extract / crawl / feed / settings / maintain / delete /
ping) runs unchanged under spark-submit: `scrape_spark.session.get_spark`
builds on the already-configured `SparkSession.builder`, so the
submit-provided master/conf win and the CLI's `--cores` local default only
applies when no master was given.
"""

import sys

from scrape_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
