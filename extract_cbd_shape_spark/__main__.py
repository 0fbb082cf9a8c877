import sys

from extract_cbd_shape_spark.cli import main

sys.exit(main())
