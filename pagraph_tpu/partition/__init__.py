"""Graph partitioning: self-reliant closures, hash + computation-aware (dg)
partitioners, locality reordering.  Covers the reference's L1 layer
(PaGraph/partition/)."""
from .dg_part import dg_assign, dg_partition
from .hash_part import hash_partition
from .kl_part import kl_assign, kl_bisect, kl_partition
from .ordering import apply_reordering, reorder_map
from .utils import extract_partition, hop_closure, partition_stats
