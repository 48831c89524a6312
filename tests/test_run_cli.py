"""Job CLI (python -m graphscope_ray.run): read → build → algo →
resumable partitioned output, the north-rule `ray job submit` path."""

import json
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from graphscope_ray.run import main
from graphscope_ray.sources.generator import MICRO_VERTICES, micro_edge_table
from graphscope_ray.sources.sink import read_partitioned_parquet
from tests.oracles import oracle_pagerank


def _write_inputs(tmp_path):
    edges = micro_edge_table().to_pandas()
    ein = str(tmp_path / "edges.parquet")
    pd.DataFrame(edges).to_parquet(ein)
    vin = str(tmp_path / "verts.parquet")
    pd.DataFrame({"vid": list(MICRO_VERTICES)}).to_parquet(vin)
    return ein, vin, edges


def test_run_pagerank_to_partitioned_output(tmp_path):
    ein, vin, edges = _write_inputs(tmp_path)
    out = str(tmp_path / "pr")
    m = main(["--algo", "pagerank", "--input", ein, "--vertices", vin,
              "--output", out, "--partitions", "3", "--directed",
              "--output-partitions", "4", "--tol", "1e-12"])
    assert m["parts_written"] >= 1 and m["rows_written"] == len(MICRO_VERTICES)
    got = read_partitioned_parquet(out).to_pandas()
    want = oracle_pagerank(list(zip(edges["src"], edges["dst"])),
                           list(MICRO_VERTICES), directed=True, tol=1e-12)
    gm = dict(zip(got["vid"], got["pagerank"]))
    for v, w in want.items():
        assert abs(gm[v] - w) < 1e-9, v


def test_run_wcc_resume_skips(tmp_path):
    ein, vin, _ = _write_inputs(tmp_path)
    out = str(tmp_path / "wcc")
    m1 = main(["--algo", "wcc", "--input", ein, "--vertices", vin,
               "--output", out, "--output-partitions", "4"])
    # wipe one partition; rerun resumes just that one
    os.remove(os.path.join(out, "part=2", "_SUCCESS"))
    m2 = main(["--algo", "wcc", "--input", ein, "--vertices", vin,
               "--output", out, "--output-partitions", "4"])
    assert m2["parts_skipped"] == 3 and m2["parts_written"] == 1
    assert (m1["rows_written"]
            == read_partitioned_parquet(out).count())


def test_run_triangles(tmp_path):
    ein, _, edges = _write_inputs(tmp_path)
    out = str(tmp_path / "tri")
    m = main(["--algo", "triangles", "--input", ein, "--output", out])
    assert m["rows_written"] > 0
    import networkx as nx
    got = read_partitioned_parquet(out).to_pandas()
    want = nx.triangles(nx.Graph(list(zip(edges["src"], edges["dst"]))))
    gm = dict(zip(got["vid"], got["triangles"]))
    for v, w in want.items():
        assert gm.get(v, 0) == w, v


def test_cli_node2vec_walks(tmp_path):
    import pandas as pd

    from graphscope_ray import run as cli
    from graphscope_ray.pipelines.walks import reference_random_walks
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    edf = pd.DataFrame(pairs, columns=["src", "dst"]).astype("int64")
    inp = str(tmp_path / "edges.parquet")
    edf.to_parquet(inp)
    out = str(tmp_path / "walks")
    m = cli.main(["--algo", "node2vec_walks", "--input", inp,
                  "--output", out, "--partitions", "3",
                  "--walk-length", "4", "--num-walks", "2",
                  "--p", "0.5", "--q", "2.0", "--seed", "7"])
    assert m["rows"] if "rows" in m else True
    import ray.data
    got = {int(r["walk"]): [int(x) for x in r["path"].split(",")]
           for r in ray.data.read_parquet(out).take_all()}
    want = reference_random_walks(pairs, 4, num_walks=2, p=0.5, q=2.0,
                                  seed=7, directed=False)
    assert got == want


def test_run_louvain_scc_kcore_hits_ppr(tmp_path):
    ein, vin, edges = _write_inputs(tmp_path)
    # louvain matches the library surface exactly
    out = str(tmp_path / "lv")
    m = main(["--algo", "louvain", "--input", ein, "--vertices", vin,
              "--output", out])
    got = read_partitioned_parquet(out).to_pandas()
    import ray.data

    from graphscope_ray.pipelines.louvain import louvain_pool
    want = louvain_pool(
        ray.data.from_pandas(pd.DataFrame(edges)),
        vertices=ray.data.from_pandas(
            pd.DataFrame({"vid": list(MICRO_VERTICES)}))).to_pandas()
    assert (dict(zip(got["vid"], got["community"]))
            == dict(zip(want["vid"], want["community"])))
    # scc on the directed micro graph vs networkx
    out2 = str(tmp_path / "scc")
    main(["--algo", "scc", "--input", ein, "--output", out2])
    got2 = read_partitioned_parquet(out2).to_pandas()
    import networkx as nx
    G = nx.DiGraph(list(zip(edges["src"], edges["dst"])))
    comp = {v: max(c) for c in nx.strongly_connected_components(G)
            for v in c}
    assert dict(zip(got2["vid"], got2["scc"])) == comp
    # kcore / hits / ppr smoke: rows land, schema stable
    for algo, extra in (("kcore", ["--k", "2"]),
                        ("hits", []),
                        ("ppr", ["--source",
                                 str(int(edges["src"][0]))])):
        o = str(tmp_path / algo)
        mm = main(["--algo", algo, "--input", ein, "--output", o]
                  + extra)
        assert mm["rows_written"] >= 1, algo


def test_cli_gnn_sage_mb(tmp_path):
    import numpy as np
    import pandas as pd

    from graphscope_ray.run import main

    rng = np.random.RandomState(1)
    n = 40
    pairs = [(int(rng.randint(n)), int(rng.randint(n)))
             for _ in range(160)]
    pairs = [(a, b) for a, b in pairs if a != b]
    ep = tmp_path / "edges.parquet"
    pd.DataFrame(pairs, columns=["src", "dst"]).astype(
        np.int64).to_parquet(ep)
    X = rng.randn(n, 3).round(3) + np.where(
        np.arange(n) < 20, -1.5, 1.5)[:, None]
    y = np.where(np.arange(n) % 2 == 0,
                 (np.arange(n) >= 20).astype(np.int64), -1)
    fp = tmp_path / "feats.parquet"
    pd.DataFrame({"vid": np.arange(n, dtype=np.int64),
                  "feat": [r.tolist() for r in X],
                  "label": y}).to_parquet(fp)
    out = tmp_path / "out"
    m = main(["--algo", "gnn_sage_mb", "--input", str(ep),
              "--features", str(fp), "--output", str(out),
              "--partitions", "3", "--epochs", "10",
              "--batch-size", "8", "--lr", "0.3"])
    assert m["rows_written"] == n
    assert m["final_train_accuracy"] >= 0.8
    got = pd.read_parquet(out)
    assert sorted(got["vid"]) == list(range(n))
    assert set(got["pred"]) <= {0, 1}


def test_cli_incremental_wcc_and_pagerank(tmp_path):
    """--warm-from/--delta: the nightly-job protocol — base run writes
    its state, the delta'd rerun warm-starts and matches a cold full
    run exactly (wcc) / to 1e-9 (pagerank)."""
    base = pd.DataFrame({"src": [0, 1, 3, 4], "dst": [1, 2, 4, 5]})
    delta = pd.DataFrame({"src": [2, 5], "dst": [3, 6]})
    full = pd.concat([base, delta], ignore_index=True)
    bpath = str(tmp_path / "base.parquet"); base.to_parquet(bpath)
    dpath = str(tmp_path / "delta.parquet"); delta.to_parquet(dpath)
    fpath = str(tmp_path / "full.parquet"); full.to_parquet(fpath)
    # base run (undirected wcc), state saved as plain parquet output
    out0 = str(tmp_path / "wcc0")
    main(["--algo", "wcc", "--input", bpath, "--output", out0,
          "--partitions", "2"])
    prev = read_partitioned_parquet(out0).to_pandas()
    ppath = str(tmp_path / "prev.parquet")
    prev[["vid", "component"]].to_parquet(ppath)
    # incremental rerun on the full table
    out1 = str(tmp_path / "wcc1")
    m = main(["--algo", "wcc", "--input", fpath, "--output", out1,
              "--partitions", "2", "--warm-from", ppath,
              "--delta", dpath])
    assert m["incremental"] is True
    got = (read_partitioned_parquet(out1).to_pandas()
           .sort_values("vid").reset_index(drop=True))
    out2 = str(tmp_path / "wcc2")
    main(["--algo", "wcc", "--input", fpath, "--output", out2,
          "--partitions", "2"])
    cold = (read_partitioned_parquet(out2).to_pandas()
            .sort_values("vid").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, cold)
    # incremental pagerank from the cold ranks converges instantly-ish
    out3 = str(tmp_path / "pr0")
    main(["--algo", "pagerank", "--input", fpath, "--output", out3,
          "--partitions", "2", "--tol", "1e-12"])
    prevpr = read_partitioned_parquet(out3).to_pandas()
    prpath = str(tmp_path / "prevpr.parquet")
    prevpr[["vid", "pagerank"]].to_parquet(prpath)
    out4 = str(tmp_path / "pr1")
    m = main(["--algo", "pagerank", "--input", fpath, "--output", out4,
              "--partitions", "2", "--tol", "1e-12",
              "--warm-from", prpath])
    # the cold run stops at max_iter=100 still shy of tol=1e-12; the
    # warm run CONTINUES the decay from there (≈50 rounds to the
    # tolerance instead of ~160 from scratch)
    assert m["incremental"] is True and m["rounds"] < 100
    a = (read_partitioned_parquet(out4).to_pandas()
         .sort_values("vid")["pagerank"].to_numpy())
    b = prevpr.sort_values("vid")["pagerank"].to_numpy()
    np.testing.assert_allclose(a, b, atol=1e-7, rtol=0)
