"""Multi-chip sharding of the prover kernels (shard_map over a Mesh).

This dimension has NO reference counterpart — zkonduit/ezkl is single-device
(SURVEY.md §2.2 end: rayon + single-GPU ICICLE only). Design per SURVEY §5:
MSM is data-parallel over the point axis with a tree combine; NTT is the
four-step (Bailey) decomposition with one all_to_all between the two local
NTT phases so butterflies ride ICI.
"""

from .sharded import make_mesh, msm_sharded, ntt_sharded  # noqa: F401
