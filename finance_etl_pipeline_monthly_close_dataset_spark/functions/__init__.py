from .datetime_fns import month_end_date, month_key, month_str, month_window
from .money import money_round

__all__ = ["month_end_date", "month_key", "month_str", "month_window", "money_round"]
