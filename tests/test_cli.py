"""CLI smoke tests (in-process, CPU backend)."""
import json
import os

import numpy as np
import pytest

from pagraph_tpu.data.formats import load_dataset, save_dataset


@pytest.fixture(scope="module")
def ds_dir(tmp_path_factory):
    from pagraph_tpu.cli import preprocess

    out = str(tmp_path_factory.mktemp("ds") / "d")
    preprocess.main([
        "--out", out, "--gen", "uniform", "--vnum", "400", "--enum", "3000",
        "--feat-size", "16", "--num-classes", "5", "--learnable-labels",
    ])
    return out


def test_preprocess_output_loads(ds_dir):
    ds = load_dataset(ds_dir)
    assert ds.num_nodes == 400
    assert ds.feat_dim == 16


def test_partition_and_verify_cli(ds_dir, capsys):
    from pagraph_tpu.cli import partition, verify_partition

    partition.main([
        "--dataset", ds_dir, "--partition", "2", "--method", "hash",
        "--num-hops", "2",
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    stats = json.loads(out)
    assert stats["num_parts"] == 2
    verify_partition.main([
        "--dataset", ds_dir, "--partition", "2", "--method", "hash",
        "--num-hops", "2",
    ])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["coverage_ok"]
    assert all(r["ok"] for r in res["partitions"])


def test_partition_cli_kl_method(ds_dir, capsys):
    from pagraph_tpu.cli import partition, verify_partition

    partition.main([
        "--dataset", ds_dir, "--partition", "2", "--method", "kl",
        "--num-hops", "2",
    ])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["num_parts"] == 2
    verify_partition.main([
        "--dataset", ds_dir, "--partition", "2", "--method", "kl",
        "--num-hops", "2",
    ])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["coverage_ok"]
    assert all(r["ok"] for r in res["partitions"])


def test_analyze_count_vnum(ds_dir, capsys):
    from pagraph_tpu.cli import analyze

    analyze.main([
        "count-vnum", "--dataset", ds_dir, "--batch-size", "64",
        "--num-neighbors", "2", "--n-layers", "1",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["vertices_per_epoch"] > 0
    assert out["edges_per_epoch"] > 0


def test_analyze_cache_oracle(ds_dir, capsys):
    from pagraph_tpu.cli import analyze

    analyze.main([
        "cache-oracle", "--dataset", ds_dir, "--batch-size", "64",
        "--top-frac", "0.2",
    ])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert 0.0 <= out["oracle_hit_rate"] <= 1.0
    assert out["oracle_hit_rate"] >= out["degree_ranked_hit_rate"] - 1e-9


def test_convert_npz_roundtrip(tmp_path, ds_dir):
    from pagraph_tpu.cli import convert
    import scipy.sparse as spsp

    ds = load_dataset(ds_dir)
    src = tmp_path / "src"
    src.mkdir()
    spsp.save_npz(str(src / "adj.npz"), ds.graph.to_coo())
    np.save(str(src / "feat.npy"), ds.features)
    np.save(str(src / "labels.npy"), ds.labels)
    out = str(tmp_path / "converted")
    convert.main(["--out", out, "--from-npz", str(src / "adj.npz")])
    ds2 = load_dataset(out)
    assert ds2.num_nodes == ds.num_nodes
    np.testing.assert_allclose(ds2.features, ds.features)


def test_train_cli_single_epoch(ds_dir, capsys):
    from pagraph_tpu.cli import train

    summary = train.main([
        "--dataset", ds_dir, "--arch", "gcn", "--n-hidden", "8",
        "--batch-size", "64", "--num-neighbors", "2", "--epochs", "2",
        "--lr", "0.01",
    ])
    assert summary["epochs"] == 2
    assert np.isfinite(summary["final_loss"])


def test_train_cli_multi_partition_kl(ds_dir):
    """--partition 2 --method kl --cpu-devices: the multi-device CLI path.
    In-process the backend is already the conftest 8-device CPU one, so
    --cpu-devices is a no-op here beyond exercising its code path."""
    from pagraph_tpu.cli import partition, train

    partition.main([
        "--dataset", ds_dir, "--partition", "2", "--method", "kl",
        "--num-hops", "2",
    ])
    summary = train.main([
        "--dataset", ds_dir, "--arch", "gcn", "--n-hidden", "8",
        "--batch-size", "64", "--num-neighbors", "2", "--epochs", "2",
        "--lr", "0.01", "--partition", "2", "--partition-method", "kl",
        "--cpu-devices", "2",
    ])
    assert summary["epochs"] == 2
    assert summary["num_devices"] == 2
    assert np.isfinite(summary["final_loss"])


def test_train_cli_on_device(ds_dir):
    """--on-device: whole-epoch-in-one-dispatch path through the CLI.
    (--fast-prng is intentionally NOT exercised here: it flips the global
    default PRNG impl for the whole test process.)"""
    from pagraph_tpu.cli import train

    summary = train.main([
        "--dataset", ds_dir, "--arch", "graphsage", "--n-hidden", "8",
        "--batch-size", "64", "--num-neighbors", "2", "--epochs", "2",
        "--lr", "0.01", "--on-device",
    ])
    assert summary["epochs"] == 2
    assert np.isfinite(summary["final_loss"])
    assert summary["miss_rate"] == 0.0


def test_scalebench_cli(ds_dir):
    """Scaling harness: 1- and 2-device runs of the same workload, with
    efficiency reported relative to the 1-device edges/s."""
    from pagraph_tpu.cli import scalebench

    result = scalebench.main([
        "--dataset", ds_dir, "--arch", "gcn", "--n-hidden", "8",
        "--batch-size", "64", "--num-neighbors", "2", "--epochs", "2",
        "--lr", "0.01", "--device-counts", "1,2",
    ])
    assert [r["devices"] for r in result["runs"]] == [1, 2]
    for r in result["runs"]:
        assert r["edges_per_s"] > 0
        assert np.isfinite(r["final_loss"])
    assert result["runs"][0]["efficiency"] == pytest.approx(1.0)


def test_train_and_eval_cli_preprocess(ds_dir, tmp_path, capsys):
    """Preprocess flagship flow end-to-end through the CLIs: train with
    --preprocess + checkpoints, replay with cli.eval --preprocess (the
    reference's pa_server --preprocess + eval.py loop; round-1 rejected
    preprocess at eval time)."""
    import json as _json

    from pagraph_tpu.cli import eval as eval_cli
    from pagraph_tpu.cli import train

    ck = str(tmp_path / "ck")
    summary = train.main([
        "--dataset", ds_dir, "--arch", "gcn", "--n-hidden", "8",
        "--batch-size", "64", "--num-neighbors", "2", "--epochs", "2",
        "--lr", "0.01", "--preprocess", "--n-layers", "2",
        "--ckpt-dir", ck, "--ckpt-every", "1",
    ])
    assert np.isfinite(summary["final_loss"])
    capsys.readouterr()
    eval_cli.main([
        "--dataset", ds_dir, "--ckpt-dir", ck, "--arch", "gcn",
        "--n-hidden", "8", "--preprocess", "--n-layers", "2",
    ])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    results = _json.loads(out)["results"]
    assert len(results) == 2
    assert all(0.0 <= a <= 1.0 for a in results.values())


def test_convert_reddit_layout_roundtrip(tmp_path):
    """Synthesized DGL-Reddit payload (reddit_data.npz + reddit_graph.npz)
    -> cli.convert -> load -> one training epoch.  Validates the ingestion
    path for the reference's flagship dataset without network access."""
    import scipy.sparse as spsp

    rng = np.random.default_rng(0)
    n = 300
    coo = spsp.random(n, n, density=0.02, format="coo", rng=rng,
                      dtype=np.float32)
    src = tmp_path / "reddit"
    src.mkdir()
    types = rng.choice([1, 2, 3], size=n, p=[0.65, 0.1, 0.25])
    np.savez(src / "reddit_data.npz",
             feature=rng.random((n, 16), dtype=np.float32),
             label=rng.integers(0, 5, size=n),
             node_types=types)
    spsp.save_npz(src / "reddit_graph.npz", coo.tocsr())

    from pagraph_tpu.cli import convert
    out = str(tmp_path / "reddit_ds")
    convert.main(["--out", out, "--from-dgl-reddit", str(src)])
    ds = load_dataset(out)
    assert ds.num_nodes == n and ds.feat_dim == 16
    assert ds.train_mask.sum() == (types == 1).sum()

    import pagraph_tpu as pg
    from pagraph_tpu.train.loop import Trainer
    m = pg.ModelConfig(arch="graphsage", n_layers=1, hidden=8, feat_dim=16,
                       n_classes=5)
    cfg = pg.Config(model=m,
                    sampler=pg.SamplerConfig(batch_size=32, fanout=2,
                                             num_hops=m.num_sampled_hops),
                    train=pg.TrainConfig(lr=1e-2))
    tr = Trainer.from_dataset(cfg, ds, seed=0)
    tr.train(1)
    assert np.isfinite(tr.epoch_metrics[-1].mean_loss)


def test_convert_ogb_layout_roundtrip(tmp_path):
    """Synthesized OGB node-property layout (edge_index + node_feat +
    node_label + split/) -> cli.convert -> load; split masks honored."""
    rng = np.random.default_rng(1)
    n, e = 200, 1500
    src = tmp_path / "ogb"
    (src / "split").mkdir(parents=True)
    np.save(src / "edge_index.npy",
            rng.integers(0, n, size=(2, e)).astype(np.int64))
    np.save(src / "node_feat.npy", rng.random((n, 8), dtype=np.float32))
    np.save(src / "node_label.npy", rng.integers(0, 4, size=n))
    perm = rng.permutation(n)
    np.save(src / "split" / "train.npy", perm[:120])
    np.save(src / "split" / "valid.npy", perm[120:150])
    np.save(src / "split" / "test.npy", perm[150:])

    from pagraph_tpu.cli import convert
    out = str(tmp_path / "ogb_ds")
    convert.main(["--out", out, "--from-ogb", str(src)])
    ds = load_dataset(out)
    assert ds.num_nodes == n
    assert ds.train_mask.sum() == 120
    assert ds.val_mask.sum() == 30
    assert ds.test_mask.sum() == 50
    assert ds.graph.num_edges > 0


def test_infer_cli_writes_predictions(ds_dir, tmp_path, capsys):
    """cli.infer: checkpoint -> full-graph predictions .npy + split accs."""
    from pagraph_tpu.cli import infer, train

    ck = str(tmp_path / "ck2")
    train.main([
        "--dataset", ds_dir, "--arch", "graphsage", "--n-hidden", "8",
        "--batch-size", "64", "--num-neighbors", "2", "--epochs", "2",
        "--lr", "0.01", "--ckpt-dir", ck, "--ckpt-every", "2",
    ])
    capsys.readouterr()
    out = str(tmp_path / "preds.npy")
    summary = infer.main([
        "--dataset", ds_dir, "--ckpt-dir", ck, "--arch", "graphsage",
        "--n-hidden", "8", "--out", out, "--save-logits",
    ])
    preds = np.load(out)
    ds = load_dataset(ds_dir)
    assert preds.shape == (ds.num_nodes,)
    logits = np.load(out + ".logits.npy")
    assert logits.shape[0] == ds.num_nodes
    np.testing.assert_array_equal(preds, logits.argmax(axis=1))
    assert 0.0 <= summary["test_acc"] <= 1.0
