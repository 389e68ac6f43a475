from .dates import (
    date_spine,
    month_name,
    smart_date_key,
    week_of_year_noniso,
)
from .money import dec, money_avg, money_sum

__all__ = [
    "date_spine",
    "month_name",
    "smart_date_key",
    "week_of_year_noniso",
    "dec",
    "money_sum",
    "money_avg",
]
