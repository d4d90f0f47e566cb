"""gpd_lite_toolbox_spark — PySpark-native analytics engine with the
query/data-processing capabilities of mthh/gpd_lite_toolbox, rebuilt
Spark-first (DataFrame/Catalyst; geometry as WKB + Arrow pandas UDFs).

See SURVEY.md for the operator inventory and the reference mapping.
"""

from .session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
