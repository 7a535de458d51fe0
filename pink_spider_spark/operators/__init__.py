from .relational import (  # noqa: F401
    contains_filter,
    find_or_create,
    latest_per_key,
    paginate,
    topk_per_key,
)
