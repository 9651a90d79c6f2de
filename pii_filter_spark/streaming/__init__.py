from .dedup import stateful_distinct  # noqa: F401
