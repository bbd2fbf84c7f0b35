"""``python -m pyrate_spark <step> -f <config>`` — the workflow CLI
(reference entry point: setup.py console_script ``pyrate`` ->
pyrate/main.py:main). On a cluster the same module runs under
``spark-submit --py-files pyrate_spark.zip -m`` semantics via a
one-line driver script calling :func:`pyrate_spark.cli.main`.
"""

from pyrate_spark.cli import main

raise SystemExit(main())
