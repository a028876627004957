"""Spark-facing geometry functions (pandas UDFs + pure-Column cell math)."""

from .geo import *  # noqa: F401,F403
from .cells import *  # noqa: F401,F403
