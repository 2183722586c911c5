"""Feature storage: host-DRAM store + HBM degree-ranked cache."""
from .cache import FeatureCache, FetchPlan, assemble_features, bucket_size
from .feature_store import FeatureStore, full_graph_mean_aggregate
