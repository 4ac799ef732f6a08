"""Multi-device runtime: meshes, sharded SSFM, halo exchange, span
pipelining, multi-host bring-up."""
from .fiber import make_link_mesh, shard_waveform, ssfm_sharded
from .multihost import initialize_multihost
from .pipeline import make_span_mesh, span_pipeline

__all__ = ["make_link_mesh", "shard_waveform", "ssfm_sharded",
           "make_span_mesh", "span_pipeline", "initialize_multihost"]
