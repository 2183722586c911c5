"""Sampling: fixed-shape minibatch IR + host neighbor samplers + loaders."""
from .block import Block, MiniBatch
from .sampler import NeighborSampler, sample_minibatch
from .loader import PrefetchLoader
