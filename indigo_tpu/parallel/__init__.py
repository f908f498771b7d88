"""Multi-chip scale-out: device meshes, sharded batched reconstruction.

The reference is strictly single-node/single-device (SURVEY.md §2
"Parallelism-strategy inventory": no DP/TP/PP, no NCCL/MPI); its only
batching is structural (KronI over coils). This package is the TPU-native
scale-out the north star adds on top:

  * data parallel  -> 'slice' mesh axis (independent slices of a volume)
  * model parallel -> 'coil' mesh axis (coil sum becomes an XLA psum)
  * sequence-parallel analogue -> sharded 3D FFT (dist_fft, per-axis FFT +
    all_to_all transpose over ICI)

All of it is GSPMD-first: payloads/data carry NamedShardings and XLA inserts
the collectives; shard_map is used only where manual control wins.
"""
from .mesh import make_mesh, replicated, shard_along
from .recon import (
    sense_normal_batched, batched_cg, sense_batch_recon,
    sense_normal_volsharded, sense_vol_recon,
    sense_normal_volsharded2, sense_vol_recon2,
)
from .dist_fft import fftn_sharded, fftn_sharded2
from .e2e import SenseReconSharded, sense_recon_sharded

__all__ = [
    "make_mesh", "replicated", "shard_along",
    "sense_normal_batched", "batched_cg", "sense_batch_recon",
    "sense_normal_volsharded", "sense_vol_recon",
    "sense_normal_volsharded2", "sense_vol_recon2",
    "fftn_sharded",
    "fftn_sharded2",
    "SenseReconSharded", "sense_recon_sharded",
]
