"""Isolation-mode sampling service: worker processes + shared-memory slots."""
import numpy as np
import pytest

from pagraph_tpu.config import SamplerConfig
from pagraph_tpu.sampling.service import SampleService


@pytest.fixture(scope="module")
def service_ds():
    from pagraph_tpu.data.synthetic import synthetic_dataset
    return synthetic_dataset(num_nodes=400, num_edges=3000, feat_dim=8,
                             num_classes=4, seed=31, learnable=True)


def test_service_covers_epoch(service_ds):
    cfg = SamplerConfig(batch_size=64, fanout=2, num_hops=2, seed=7)
    svc = SampleService(service_ds.graph, service_ds.train_nids, cfg,
                        labels=service_ds.labels, num_workers=2, num_slots=4)
    try:
        seen = []
        n_batches = 0
        for mb in svc.epoch():
            n = np.asarray(mb.seed_mask).sum()
            seeds = np.asarray(mb.layer_nids[-1])[:n]
            seen.append(seeds.copy())
            # labels travel with the batch
            np.testing.assert_array_equal(
                np.asarray(mb.labels)[:n], service_ds.labels[seeds]
            )
            n_batches += 1
        assert n_batches == svc.num_batches
        seen = np.sort(np.concatenate(seen))
        np.testing.assert_array_equal(seen, np.sort(service_ds.train_nids))
    finally:
        svc.close()


def test_service_blocks_are_valid(service_ds):
    g = service_ds.graph
    cfg = SamplerConfig(batch_size=32, fanout=3, num_hops=2, seed=3)
    svc = SampleService(g, service_ds.train_nids[:96], cfg,
                        labels=service_ds.labels, num_workers=1, num_slots=2)
    try:
        edges = set()
        for v in range(g.num_nodes):
            for u in g.in_neighbors(v):
                edges.add((int(u), int(v)))
        for mb in svc.epoch():
            for i, block in enumerate(mb.blocks):
                src = np.asarray(mb.layer_nids[i])
                dst = np.asarray(mb.layer_nids[i + 1])
                n_dst = int(np.asarray(mb.layer_mask[i + 1]).sum())
                npos = np.asarray(block.neigh_pos)
                nmask = np.asarray(block.neigh_mask)
                for d in range(0, n_dst, 7):
                    for k in range(nmask.shape[1]):
                        if nmask[d, k]:
                            assert (int(src[npos[d, k]]), int(dst[d])) in edges
    finally:
        svc.close()


def test_one2all_covers_epoch_disjointly(service_ds):
    """one2all: N consumers round-robin over ONE worker pool; together they
    cover the full train set (plus make-up batches at the tail)."""
    import threading

    cfg = SamplerConfig(batch_size=32, fanout=2, num_hops=2, seed=5)
    svc = SampleService(service_ds.graph, service_ds.train_nids, cfg,
                        labels=service_ds.labels, num_workers=2,
                        num_slots=4, num_consumers=2)
    try:
        results = {0: [], 1: []}

        def consume(rank):
            for mb in svc.epoch_for(rank):
                n = np.asarray(mb.seed_mask).sum()
                results[rank].append(
                    np.asarray(mb.layer_nids[-1])[:n].copy()
                )

        threads = [threading.Thread(target=consume, args=(r,)) for r in (0, 1)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert len(results[0]) == len(results[1]) == svc.num_batches
        seen = np.unique(np.concatenate(results[0] + results[1]))
        np.testing.assert_array_equal(seen, np.sort(service_ds.train_nids))
    finally:
        svc.close()


def test_trainer_with_remote_sampling(service_ds):
    import pagraph_tpu as pg
    from pagraph_tpu.train.loop import Trainer

    cfg = pg.Config(
        model=pg.ModelConfig(arch="gcn", n_layers=1, hidden=8, feat_dim=8,
                             n_classes=4),
        sampler=pg.SamplerConfig(batch_size=64, fanout=2, num_hops=2),
        train=pg.TrainConfig(lr=1e-2, remote_sampling=True),
    )
    tr = Trainer.from_dataset(cfg, service_ds, seed=0)
    tr.train(2)
    losses = [m.mean_loss for m in tr.epoch_metrics]
    assert losses[-1] < losses[0] + 0.5
    tr.sampler.close()
