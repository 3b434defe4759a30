"""Synthetic id arithmetic shared by scorers/persisters.

Reference formulas (kept bit-for-bit for parity, see SURVEY.md §2.8):

* ``pair_id = min(dv1, dv2) * 1_000_000 + max(dv1, dv2)``
  (stage/MatchCandidatePersisterStage.scala:52)
* ``id = (dv1 * 1_000_000 + dv2) * 100 + entity_type_id``
  (scorer/EntitiesScorer.scala:57)

These overflow/collide once document ids reach 1e6 — the driver fixtures
keep ids below that (FIXTURES.md preamble).  At 100 TB scale switch the key
to a struct ``(dv1, dv2)`` or a 128-bit hash; the helpers isolate the
decision to this module.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PAIR_BASE = 1_000_000


def pair_id(dv1: Column, dv2: Column) -> Column:
    """Canonical (order-insensitive) pair key."""
    return (
        F.least(dv1, dv2) * F.lit(PAIR_BASE) + F.greatest(dv1, dv2)
    ).cast("long")


def candidate_id(dv1: Column, dv2: Column, type_id: int) -> Column:
    """Per-(pair, score-type) id — EntitiesScorer.scala:57."""
    return (
        (dv1.cast("long") * F.lit(PAIR_BASE) + dv2.cast("long")) * F.lit(100)
        + F.lit(type_id)
    ).cast("long")


def partner_id(pair_product: Column, known: Column) -> Column:
    """Recover the partner doc id from a pair product —
    TotalStatisticStage.scala:63-64 uses ``other = dv1*dv2/known``."""
    return (pair_product / known).cast("long")
