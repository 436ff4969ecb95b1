.PHONY: test gate bench scale package job clean

test:            ## golden equality + operator tests (north-rule command)
	python -m pytest tests/ -x -q

gate:            ## Spark vs DuckDB parity for every query (driver replica)
	python scripts/check_oracle.py /root/testdata/sf0.01

bench:           ## one-JSON-line throughput benchmark
	python bench.py

scale:           ## N vs 4N scaling efficiency → BENCH.md
	python scripts/scaling_bench.py --reps 100

package:         ## build dist/engine.zip for spark-submit --py-files
	python scripts/package.py

job: package     ## resumable extraction job via spark-submit
	spark-submit --master local[16] \
		--conf spark.driver.memory=8g \
		--conf "spark.driver.extraJavaOptions=-Xms8g -XX:+AlwaysPreTouch" \
		--py-files dist/engine.zip job.py \
		--sf-dir /root/testdata/sf0.1 --out /tmp/extract_out

clean:
	rm -rf dist spark-warehouse derby.log .pytest_cache \
		/tmp/paddleocr_spark_corpus_cache
