"""``python -m tax_compliance_engine_spark`` — the module entry point.

Mirrors the ``tax-engine-spark`` console script (pyproject
``[project.scripts]``) so the engine is drivable from any checkout or
installed wheel without relying on script-path setup:

    python -m tax_compliance_engine_spark calculate --file txns.csv
    python -m tax_compliance_engine_spark rates --state TX
"""

from .cli import main

if __name__ == "__main__":
    main()
