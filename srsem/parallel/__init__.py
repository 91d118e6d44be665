"""Parallelism: GSPMD sharding rules over the (data, model) mesh."""

from srsem.parallel.sharding import (  # noqa: F401
    param_pspecs,
    param_shardings,
)
