from .curate import (
    curate_dim_customer,
    curate_dim_product,
    curate_fact,
    transform_raw_transactions,
)

__all__ = [
    "transform_raw_transactions",
    "curate_fact",
    "curate_dim_customer",
    "curate_dim_product",
]
