"""Single validated configuration shared by every phase.

The reference spreads its configuration over per-script argparse flags with a
fragile manual consistency contract (``--num-hops``/``--preprocess``/
``--num-workers`` must agree between partitioner, server and trainer;
reference: README.md:115-117, examples/profile/pa_gcn.py:117-151).  Here a
single dataclass is built once and handed to the partitioner, sampler, cache
and trainer, so the ``hops = layers - 1 iff preprocess`` rule
(reference: server/pa_server.py:72) is enforced in one place.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Optional, Tuple


@dataclasses.dataclass
class ModelConfig:
    arch: str = "gcn"                 # gcn | graphsage | gcn_cv | gat | gin
    n_layers: int = 1                 # hidden layers (reference convention: total GNN layers = n_layers + 1)
    hidden: int = 32
    feat_dim: int = 600
    n_classes: int = 60
    dropout: float = 0.2
    aggregator: str = "mean"          # graphsage: mean | gcn | pool | lstm
    num_heads: int = 4                # gat: attention heads per layer
    preprocess: bool = False          # layer-0 pre-aggregated server-side
    skip_connection: bool = True      # cat((h, act(h))) on the last hidden
                                      # layer; False = the reference's plain
                                      # gcn_ns variant (model/gcn_ns.py)

    @property
    def num_gnn_layers(self) -> int:
        return self.n_layers + 1

    @property
    def num_sampled_hops(self) -> int:
        """Hops the sampler must expand: one less under preprocess
        (reference: server/pa_server.py:72)."""
        return self.num_gnn_layers - (1 if self.preprocess else 0)


@dataclasses.dataclass
class SamplerConfig:
    batch_size: int = 6000
    fanout: int = 2                   # neighbors per vertex per hop (reference default --num-neighbors 2)
    fanouts: Optional[Tuple[int, ...]] = None
                                      # per-layer fanouts (beyond-reference:
                                      # the DGL-style [15,10,5] recipe),
                                      # LAYER-ordered like DGL: fanouts[0]
                                      # is the outermost (input-side) hop,
                                      # fanouts[-1] expands from the seeds.
                                      # None = (fanout,) * num_hops
    num_hops: int = 2                 # layered expansion depth
    include_self: bool = True         # dst vertex kept in src layer (NodeFlow semantics)
    cap_factor: float = 1.0           # scales worst-case per-layer capacity
    auto_caps: bool = True            # probe batches and shrink caps to occupancy
    backend: str = "auto"             # auto | numpy | native
    prefetch: int = 2                 # batches in flight (loader double-buffering)
    seed: int = 0
    paired_draws: bool = False        # on-device sampler: ROW-GATHER draws.
                                      # The adjacency list is viewed as an
                                      # [E/8, 8] table and each vertex draw
                                      # fetches ONE aligned 32 B row that
                                      # serves up to 8 fanout slots — one
                                      # HBM gather transaction per vertex
                                      # per 8-slot window instead of one per
                                      # slot (the sampler is transaction-
                                      # bound; CLAUDE.md "Gather ceiling").
                                      # Per-slot marginals are EXACTLY
                                      # uniform over the neighbor list;
                                      # slots within one window are
                                      # correlated (near-without-
                                      # replacement inside the aligned 8-
                                      # wide window), windows independent.
                                      # Tradeoff: vertices with deg <=
                                      # fanout get uniform WITH-replacement
                                      # draws instead of take-all (valid-
                                      # slot count unchanged).  Details:
                                      # sampling/device_sampler.sample_hop

    def hop_fanouts(self) -> Tuple[int, ...]:
        """Fanout at each expansion hop, seeds outward.

        ``hop_fanouts()[0]`` samples the seeds' neighbors; ``[-1]`` produces
        the outermost layer.  (The public ``fanouts`` field is LAYER-ordered
        like DGL's ``[15,10,5]`` — this reverses it.)  Uniform ``fanout``
        unless ``fanouts`` is set.
        """
        if self.fanouts is not None:
            fs = tuple(int(f) for f in reversed(self.fanouts))
            if len(fs) != self.num_hops:
                raise ValueError(
                    f"fanouts {tuple(self.fanouts)} must have "
                    f"num_hops={self.num_hops} entries"
                )
            if any(f < 1 for f in fs):
                raise ValueError(
                    f"fanouts must be >= 1, got {tuple(self.fanouts)}")
            return fs
        return (self.fanout,) * self.num_hops

    def block_fanouts(self) -> Tuple[int, ...]:
        """Per-block fanouts, outermost block first (aligned with
        ``layer_capacities()[1:]``: block b connects layer b -> b+1).
        Equals the public layer-ordered ``fanouts`` when it is set."""
        return tuple(reversed(self.hop_fanouts()))

    def layer_capacities(self, num_nodes: int, pad_to: int = 8) -> Tuple[int, ...]:
        """Static padded capacity of each minibatch layer, seeds last.

        Layer ``num_hops`` holds the seeds (batch_size wide); each outer layer
        can hold at most prev * (hop fanout + include_self) unique vertices,
        capped at the graph size.  Shapes are rounded up so every batch reuses
        one XLA executable.
        """
        caps = [self.batch_size]
        inc = 1 if self.include_self else 0
        for f in self.hop_fanouts():
            nxt = min(int(caps[-1] * (f + inc) * self.cap_factor), num_nodes)
            nxt = max(nxt, 1)
            caps.append(nxt)
        caps = [-(-c // pad_to) * pad_to for c in caps]
        return tuple(reversed(caps))  # index 0 = outermost layer


@dataclasses.dataclass
class CacheConfig:
    enabled: bool = True
    capacity: Optional[int] = None    # vertices; None = auto from HBM budget
    hbm_reserve_bytes: int = 1 << 30  # headroom kept free (reference keeps 1 GiB, storage.py:81)
    rank_by: str = "out_degree"       # out_degree | in_degree | access_freq
    track_stats: bool = True
    dtype: str = "float32"            # feature storage dtype; "bfloat16"
                                      # halves cache HBM, miss-path H2D and
                                      # ICI halo traffic (compute stays f32);
                                      # "int8" quarters them (per-column
                                      # symmetric quantization, dequant fused
                                      # into the first consumer inside jit)


@dataclasses.dataclass
class PartitionConfig:
    num_parts: int = 1
    method: str = "dg"                # dg | hash
    num_hops: int = 1                 # closure depth for self-reliance
    ordering: bool = False            # locality reordering before partitioning
    edge_balance: bool = False        # dg: weight the balance term by
                                      # in_deg+1 so partitions balance their
                                      # CSR EDGE footprint (edge mode pads
                                      # every chip to max_p(E_p); hub-heavy
                                      # graphs skew badly under the plain
                                      # vertex-count formula).  Affinity and
                                      # redundancy terms stay reference-
                                      # faithful (dg.py:54)


@dataclasses.dataclass
class TrainConfig:
    lr: float = 3e-2
    lr_schedule: str = "none"         # none | cosine (beyond-reference:
                                      # optax cosine decay to 5% of lr over
                                      # lr_decay_steps optimizer steps)
    lr_decay_steps: int = 0           # cosine horizon; required > 0 when
                                      # lr_schedule='cosine'
    epochs: int = 10
    log_every: int = 20
    warmup_epochs: int = 2            # excluded from epoch-time mean (reference: pa_gcn.py:106)
    ckpt_dir: Optional[str] = None
    ckpt_every: int = 0               # epochs between checkpoints; 0 = off
    eval_every: int = 0               # epochs between validation-accuracy
                                      # evals (full-neighborhood inference
                                      # over the val mask); 0 = off.  The
                                      # reference only evaluates offline
                                      # (examples/eval.py)
    eval_backend: str = "auto"        # full-graph inference backend:
                                      # "host" (scipy SpMM aggregation),
                                      # "device" (chunked edge scatters on
                                      # the accelerator — orders of
                                      # magnitude faster at products scale)
                                      # or "auto" (device at >=2M edges)
    remote_sampling: bool = False     # isolation mode: sampling in worker procs
    on_device_sampling: bool = False  # sample inside jit; whole epoch = one
                                      # dispatch (needs graph + full feature
                                      # cache in HBM; see train/device_epoch.py)
    steps_per_dispatch: int = 8       # K batches per compiled call (lax.scan)
    epoch_dispatch: str = "scan"      # on-device epoch driver: "scan" (whole
                                      # epoch = ONE dispatch, lax.scan),
                                      # "steps" (one async dispatch per
                                      # minibatch, all inputs device-resident
                                      # — zero H2D inside the epoch either
                                      # way), or "pipelined" (two dispatches
                                      # per minibatch: a state-INDEPENDENT
                                      # sample+gather enqueued one batch
                                      # ahead of the state-chained
                                      # fwd/bwd/Adam; trajectory identical
                                      # to scan/steps.  MEASURED SLOWER —
                                      # 23.9 vs 21.6 ms/step at the
                                      # leaderboard shape: the runtime
                                      # executes dispatches serially, so
                                      # the split only adds materialization
                                      # — kept as the recorded pipelining
                                      # experiment, see
                                      # device_epoch.make_device_pipelined_fns).
                                      # "steps" is +2.6% at the [15,10,5]
                                      # b1024 h256 leaderboard shape and
                                      # compiles ~2.6x faster; a loss at
                                      # small steps where dispatch overhead
                                      # dominates (BENCH_NOTES "per-step
                                      # dispatch A/B")
    scan_unroll: int = 1              # on-device epoch: minibatches unrolled
                                      # per scan iteration (the step is
                                      # latency-bound, not FLOP-bound, at the
                                      # reference's small batch shapes;
                                      # unrolling lets XLA overlap fusions
                                      # across adjacent steps)
    halo_slack: float = 1.5           # ici/edge modes: static halo width =
                                      # slack * cap0/P (bucketed). Raise it
                                      # when the halo-drop warning fires
                                      # (skewed ownership or deep-fanout
                                      # batches can overflow the default)
    halo_pipeline: bool = False       # edge mode: sample + halo-exchange
                                      # batch i+1 inside batch i's scan step
                                      # so the all_to_all is dataflow-
                                      # independent of the fwd/bwd and XLA's
                                      # latency-hiding scheduler can overlap
                                      # ICI with compute (SURVEY §7 "halo
                                      # overlap" hard part; trajectory is
                                      # bit-identical to the unpipelined
                                      # epoch)
    dtype: str = "float32"            # compute dtype for model fwd/bwd:
                                      # "bfloat16" casts params+activations
                                      # (double MXU matmul rate; master
                                      # params, optimizer and loss stay f32
                                      # — train/state.py cast_apply)


@dataclasses.dataclass
class Config:
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    sampler: SamplerConfig = dataclasses.field(default_factory=SamplerConfig)
    cache: CacheConfig = dataclasses.field(default_factory=CacheConfig)
    partition: PartitionConfig = dataclasses.field(default_factory=PartitionConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)

    def __post_init__(self):
        self.validate()

    def validate(self) -> None:
        m, s = self.model, self.sampler
        if m.arch not in ("gcn", "graphsage", "gcn_cv", "gat", "gin"):
            raise ValueError(f"unknown arch {m.arch!r}")
        if m.aggregator not in ("mean", "gcn", "pool", "lstm"):
            raise ValueError(f"unknown aggregator {m.aggregator!r}")
        if m.arch == "gcn_cv" and not m.preprocess:
            raise ValueError(
                "gcn_cv consumes pre-aggregated layer-0 features: set "
                "model.preprocess=True (reference: gcn_cvsc.py:69)"
            )
        if m.arch == "gat":
            if m.preprocess:
                raise ValueError(
                    "gat needs raw per-neighbor features: preprocess "
                    "pre-aggregation is incompatible with attention"
                )
            if m.num_heads < 1:
                raise ValueError("gat needs num_heads >= 1")
        if m.arch == "gin" and m.preprocess:
            raise ValueError(
                "gin needs the raw (1+eps)*self + sum update: the store's "
                "mean pre-aggregation would change the model"
            )
        import numbers
        if (isinstance(s.fanout, bool)
                or not isinstance(s.fanout, numbers.Integral)):
            raise ValueError(
                f"sampler.fanout must be an integer (got "
                f"{type(s.fanout).__name__}); pass per-hop lists via "
                "sampler.fanouts"
            )
        s.hop_fanouts()                 # raises on bad per-hop fanouts
        # The one cross-phase contract the reference leaves to the user:
        if s.num_hops != m.num_sampled_hops:
            raise ValueError(
                f"sampler.num_hops={s.num_hops} must equal "
                f"model layers{'-1 (preprocess)' if m.preprocess else ''}"
                f"={m.num_sampled_hops}"
            )
        if self.partition.num_hops < 1:
            raise ValueError("partition.num_hops must be >= 1")
        t = self.train
        if t.lr_schedule not in ("none", "cosine"):
            raise ValueError(f"unknown lr_schedule {t.lr_schedule!r}")
        if t.lr_schedule == "cosine" and t.lr_decay_steps <= 0:
            raise ValueError(
                "lr_schedule='cosine' needs lr_decay_steps > 0 "
                "(total optimizer steps of the planned run)")
        if t.halo_slack < 1.0:
            raise ValueError("train.halo_slack must be >= 1.0")
        if t.dtype not in ("float32", "bfloat16"):
            raise ValueError(f"train.dtype must be float32|bfloat16, "
                             f"got {t.dtype!r}")
        if t.eval_backend not in ("host", "device", "auto"):
            raise ValueError(f"train.eval_backend must be host|device|auto, "
                             f"got {t.eval_backend!r}")
        if t.epoch_dispatch not in ("scan", "steps", "pipelined"):
            raise ValueError(f"train.epoch_dispatch must be "
                             f"scan|steps|pipelined, "
                             f"got {t.epoch_dispatch!r}")
        if t.epoch_dispatch != "scan" and not t.on_device_sampling:
            raise ValueError(
                f"epoch_dispatch={t.epoch_dispatch!r} only applies to the "
                "on-device sampling path (train.on_device_sampling=True)")
        if self.cache.dtype not in ("float32", "bfloat16", "int8"):
            raise ValueError(f"cache.dtype must be float32|bfloat16|int8, "
                             f"got {self.cache.dtype!r}")
        if t.on_device_sampling:
            if t.remote_sampling:
                raise ValueError(
                    "on_device_sampling and remote_sampling are exclusive"
                )
            if not self.cache.enabled:
                raise ValueError(
                    "on_device_sampling requires cache.enabled (the full "
                    "feature set must live in HBM)"
                )
            if not s.include_self:
                raise ValueError("on_device_sampling requires include_self")

    def sync_hops(self) -> "Config":
        """Derive sampler/partition hops from the model (the safe default)."""
        self.sampler.num_hops = self.model.num_sampled_hops
        self.partition.num_hops = self.model.num_sampled_hops
        return self

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "Config":
        raw = json.loads(text)
        return cls(
            model=ModelConfig(**raw.get("model", {})),
            sampler=SamplerConfig(**raw.get("sampler", {})),
            cache=CacheConfig(**raw.get("cache", {})),
            partition=PartitionConfig(**raw.get("partition", {})),
            train=TrainConfig(**raw.get("train", {})),
        )
