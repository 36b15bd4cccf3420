"""Distribution layer: channel (DP) x time-block (SP) sharding over a mesh.

The reference is single-threaded (SURVEY.md section 2: no parallelism of any
kind); this layer is the TPU-native new component pinned by BASELINE.json's
north star: shard independent channels and time blocks across a device mesh,
exchange (taps_per_phi - 1)-sample history tails at block boundaries over ICI
(overlap-save halo via ppermute), and compute each block's entry phase state
in closed form so blocks are independent after one halo exchange — no
sequential scan across devices.
"""

from .sharded import (
    make_mesh, shard_filt_block, shard_filt, sharded_resample, compact,
)
from .multihost import initialize, is_multihost, local_data_slice

__all__ = ["make_mesh", "shard_filt_block", "shard_filt", "sharded_resample",
           "compact", "initialize", "is_multihost", "local_data_slice"]
