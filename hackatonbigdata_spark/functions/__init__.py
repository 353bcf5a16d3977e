from hackatonbigdata_spark.functions.core import (
    iso_dow,
    r4,
    safe_div,
    wmape_expr,
)

__all__ = ["iso_dow", "r4", "safe_div", "wmape_expr"]
