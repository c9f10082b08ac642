"""spark-submit primary for the CLI: spark-submit can only take a FILE
as the application (no ``-m`` module mode), and running the package's
cli.py as a file breaks its relative imports. Use:

    spark-submit --py-files dist/datashare_extension_neo4j_spark.zip \
        tools/submit_cli.py build --pages … --run-dir …
"""

import sys

from datashare_extension_neo4j_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
