"""eristropy_ray — a Ray-Data-native time-series entropy rollup engine.

A from-scratch engine with the analytical capabilities of zblanks/eristropy
(sample entropy, permutation entropy, stationarity preprocessing, parameter
selection) re-expressed as streaming Ray Data pipelines over Parquet tables
of multi-turn conversation transcripts, with 1m/1h/1d retention-tier rollups,
linear-interpolation gap-fill and Gorilla/delta-of-delta compressed tier
blocks.

Layers
------
- ``kernels``   pure-numpy numerical core (zero Ray): SampEn, PermEn, ADF,
                stationary bootstrap, GP/linreg detrending, Lake analytic SE.
- ``codecs``    Gorilla XOR float codec, delta-of-delta timestamp codec,
                linear gap-fill.
- ``stages``    vectorized Arrow ``map_batches`` / ``map_groups`` stage
                functions (stateless where possible, actor classes where
                state amortizes).
- ``sources``   transcript reader + deterministic synthetic generator;
                adapters turning generic event tables into signal tables.
- ``pipelines`` end-to-end Dataset pipelines (flagship rollup, stationarity,
                entropy-over-signals).
- ``state``     per-partition checkpoint manifest + lineage/metrics sidecar.

All randomized components use explicit counter-based ``numpy`` seeding so
results are independent of Ray task placement and scheduling order.
"""

__version__ = "0.1.0"
