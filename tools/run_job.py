#!/usr/bin/env python
"""spark-submit entry point for the staged KG job.

The north rule's launch shape::

    python tools/make_pyfiles.py
    spark-submit --py-files dist/ner_spark.zip tools/run_job.py \
        --input <parquet> --output <dir> [--stage materialize] [--force]

spark-submit puts the --py-files zip on the driver's sys.path and ships
it to executors; this wrapper then just delegates to
``ner_spark.plans.job.main`` (which is also runnable directly as
``python -m ner_spark.plans.job`` in local dev).
"""

from ner_spark.plans.job import main

if __name__ == "__main__":
    main()
