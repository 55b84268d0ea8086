"""Single-process pandas/numpy oracle of the reference semantics."""

from .oracle import (  # noqa: F401
    oracle_mentions,
    oracle_link,
    oracle_triples,
    oracle_components,
)
