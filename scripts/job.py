"""spark-submit entry shim: the cluster-side main for the engine CLI.

    scripts/package.sh engine.zip
    spark-submit --master ... --py-files engine.zip scripts/job.py \
        --events EVENTS_DIR --table TABLE_ROOT --checkpoint CK \
        current --drain

`--py-files` distributes engine.zip to every executor; this shim only
needs the driver-side import to resolve (SparkContext adds the zip to
sys.path on the driver too).
"""

from arango_etl_spark.cli import main

if __name__ == "__main__":
    main()
