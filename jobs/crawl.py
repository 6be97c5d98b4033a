#!/usr/bin/env python
"""spark-submit primary application file for a crawl session.

spark-submit needs a primary .py FILE (it has no module ``-m`` flag),
so this shim is the cluster entry point; all arguments are those of
``methanol_web_crawler_spark.jobs.crawl`` (the full CLI: .conf files,
named built-ins, politeness modes, bloom, resume, sinks):

    cd <repo> && zip -qr methanol_web_crawler_spark.zip \
        methanol_web_crawler_spark
    spark-submit --py-files methanol_web_crawler_spark.zip \
        jobs/crawl.py \
        --conf-dir conf --conf conf/default.conf \
        --docs /data/docs.parquet \
        --state-dir /data/crawl-state --seeds http://a.test/ \
        [--politeness friendly|coward|aggressive|<budget>] \
        [--salt-k 8] [--bloom-buckets 64] [--resume]

Locally the module form works directly:

    python -m methanol_web_crawler_spark.jobs.crawl \
        --config default --synth-docs 5000 --synth-hosts 50
"""

import sys

from methanol_web_crawler_spark.jobs.crawl import main

if __name__ == "__main__":
    sys.exit(main())
