"""Dataset tooling: on-disk formats, loaders, synthetic generators.

Covers the reference's L0 layer (PaGraph/data/) — get_data.py loaders,
preprocess.py converters, gen_dataset.py random graphs.
"""
from .formats import (
    Dataset,
    PartitionArtifact,
    load_dataset,
    load_partition,
    partition_dir,
    save_dataset,
    save_partition,
)
from .synthetic import (neighborhood_labels, random_coo, random_split_masks,
                        rmat_coo, synthetic_dataset)
