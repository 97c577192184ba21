"""Compressed tier-block codecs (net-new vs the reference; see SURVEY.md §2.8).

Designed from the public Gorilla paper (Pelkonen et al., "Gorilla: A Fast,
Scalable, In-Memory Time Series Database", VLDB 2015): XOR float encoding
with leading/meaningful-bit windows for entropy values, delta-of-delta
encoding for bucket timestamps, plus linear-interpolation gap-fill over
missing retention-tier buckets.
"""

from eristropy_ray.codecs.gorilla import gorilla_encode, gorilla_decode
from eristropy_ray.codecs.dod import dod_encode, dod_decode
from eristropy_ray.codecs.gapfill import gapfill_series

__all__ = [
    "gorilla_encode",
    "gorilla_decode",
    "dod_encode",
    "dod_decode",
    "gapfill_series",
]
