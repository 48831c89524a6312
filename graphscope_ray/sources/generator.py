"""Deterministic synthetic source-code corpus (FIXTURES.md F1/F3).

Generates the north-rule input table ``(repo, path, commit, lang,
content)`` (BASELINE.json input_hint) with planted structure:

- community structure: repos in community ``c`` share basenames
  ``lib_{c}_{j}.h`` — some repos *provide* the file, others *reference*
  it via an include line, so the derived repo→repo graph has dense
  intra-community blocks (mirrors the reference's p2p-31 test graph
  role, ``python/graphscope/tests/conftest.py:395-460``);
- hub keys ``common_{k}.h`` provided by a few hub repos and referenced
  corpus-wide (power-law dep-key skew fixture);
- isolated repos whose keys are private → singleton WCC components;
- leaf repos that provide but never reference → out-degree-0 vertices
  (PageRank dangling fixture).

Everything is a pure function of (index, seed) via splitmix64 — there
is no RNG call-order coupling, so any subset of rows can be generated
independently and the corpus is bit-identical across runs and
processes. That is what makes the per-row ``sha256(content)`` ingest
invariant testable.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from graphscope_ray.functions.hashing import splitmix64

LANGS = ["py", "c", "cpp", "java", "go", "rs"]


def _mix(seed: int, *idx: int) -> np.ndarray:
    x = np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
    for v in idx:
        x = splitmix64(np.asarray([x], dtype=np.uint64))[0] ^ np.uint64(v & 0xFFFFFFFFFFFFFFFF)
    return splitmix64(np.asarray([x], dtype=np.uint64))[0]


class CorpusSpec:
    """Parameters of the synthetic corpus; all derived counts are pure
    functions of these + seed."""

    def __init__(
        self,
        n_repos: int = 60,
        n_communities: int = 4,
        keys_per_community: int = 6,
        n_hub_keys: int = 2,
        n_hub_repos: int = 2,
        frac_isolated: float = 0.08,
        frac_leaf: float = 0.15,
        mean_files: int = 8,
        seed: int = 42,
        body_tokens: int = 4,
    ):
        self.n_repos = n_repos
        self.n_communities = n_communities
        self.keys_per_community = keys_per_community
        self.n_hub_keys = n_hub_keys
        self.n_hub_repos = n_hub_repos
        self.n_isolated = max(1, int(n_repos * frac_isolated))
        self.n_leaf = max(1, int(n_repos * frac_leaf))
        self.mean_files = mean_files
        self.seed = seed
        # filler tokens per file body: 4 ≈ 100 B/file (round-1 corpora);
        # raise for realistic source-file sizes (64 ≈ 700 B, 256 ≈ 2.5 KB)
        # so the sha256+regex ingest is a representative compute share
        self.body_tokens = body_tokens

    # --- repo-level pure derivations ------------------------------------
    def repo_name(self, i: int) -> str:
        return f"org{i % 17}/repo{i:06d}"

    def community_of(self, i: int) -> int:
        # isolated repos live at the tail and get their own pseudo-community
        if i >= self.n_repos - self.n_isolated:
            return -1
        return i % self.n_communities

    def is_hub(self, i: int) -> bool:
        return i < self.n_hub_repos

    def is_leaf(self, i: int) -> bool:
        # leaves provide files but reference nothing (dangling vertices)
        if self.is_hub(i) or self.community_of(i) == -1:
            return False
        return int(_mix(self.seed, 7, i)) % 100 < int(100 * self.n_leaf / max(1, self.n_repos))

    def n_files_of(self, i: int) -> int:
        # hub repos are big (zipf-ish head); others ~mean_files
        base = self.mean_files * (8 if self.is_hub(i) else 1)
        jitter = int(_mix(self.seed, 11, i)) % self.mean_files
        return max(2, base + jitter - self.mean_files // 2)

    def lang_of(self, i: int) -> str:
        return LANGS[int(_mix(self.seed, 13, i)) % len(LANGS)]


def _rows_for_repo(spec: CorpusSpec, i: int):
    """Generate all file rows of repo i (pure function of spec+i)."""
    repo = spec.repo_name(i)
    comm = spec.community_of(i)
    lang = spec.lang_of(i)
    commit = hashlib.sha1(f"{repo}@{spec.seed}".encode()).hexdigest()
    nf = spec.n_files_of(i)
    hub_keys = [f"common_{k}.h" for k in range(spec.n_hub_keys)]
    comm_keys = (
        [f"lib_{comm}_{j}.h" for j in range(spec.keys_per_community)] if comm >= 0 else []
    )
    iso_keys = [f"private_{i}_{j}.h" for j in range(2)] if comm < 0 else []

    rows = []
    for f in range(nf):
        h = int(_mix(spec.seed, 17, i, f))
        # choose the file's basename: providers materialize shared keys
        provides_pool = comm_keys or iso_keys
        if spec.is_hub(i) and f < spec.n_hub_keys:
            base = hub_keys[f]  # hub repos provide the hub keys
        elif provides_pool and h % 3 == 0:
            base = provides_pool[h % len(provides_pool)]
        else:
            base = f"file_{i}_{f}.{lang}"
        path = f"src/d{f:03d}/{base}"  # unique path per file; dep key = basename

        # include lines = referenced dep keys
        includes: list[str] = []
        if not spec.is_leaf(i):
            if comm >= 0 and comm_keys:
                includes.append(comm_keys[(h >> 8) % len(comm_keys)])
                if h % 5 == 0:
                    includes.append(comm_keys[(h >> 16) % len(comm_keys)])
            if comm < 0 and iso_keys:
                includes.append(iso_keys[(h >> 8) % len(iso_keys)])
            if comm >= 0 and h % 4 == 0:  # corpus-wide hub reference (skew)
                includes.append(hub_keys[(h >> 24) % len(hub_keys)])
        body = [f"// {repo}:{path}"]
        body += [f'#include "{inc}"' for inc in includes]
        # first 4 tokens keep the round-1 formula so existing cached
        # corpora stay byte-identical at body_tokens=4
        body += [f"tok_{(h >> (4 * j)) & 0xFFFF}" for j in range(min(4, spec.body_tokens))]
        body += [f"tok_{(h * 0x9E3779B97F4A7C15 + j * 0xBF58476D1CE4E5B9) % (1 << 24):x}"
                 for j in range(4, spec.body_tokens)]
        rows.append((repo, path, commit, lang, "\n".join(body) + "\n"))
    return rows


def corpus_table(spec: CorpusSpec, repo_lo: int = 0, repo_hi: int | None = None) -> pa.Table:
    """Materialize rows for repos in [repo_lo, repo_hi) as an Arrow table."""
    repo_hi = spec.n_repos if repo_hi is None else repo_hi
    cols = {k: [] for k in ("repo", "path", "commit", "lang", "content")}
    for i in range(repo_lo, repo_hi):
        for r in _rows_for_repo(spec, i):
            for k, v in zip(cols, r):
                cols[k].append(v)
    return pa.table({k: pa.array(v, pa.string()) for k, v in cols.items()})


def _write_shard(out_dir: str, spec: CorpusSpec, lo: int, hi: int) -> str:
    p = os.path.join(out_dir, f"part-{lo:08d}.parquet")
    if not os.path.exists(p):
        tmp = p + f".tmp{os.getpid()}"
        pq.write_table(corpus_table(spec, lo, hi), tmp)
        os.replace(tmp, p)  # atomic publish
    return p


def write_corpus(out_dir: str, spec: CorpusSpec, repos_per_file: int = 2000) -> list[str]:
    """Write the corpus as a directory of parquet shards (resumable
    layout: one file per repo range; reruns skip existing shards).
    Rows are pure functions of (index, seed), so shards are generated
    in parallel as Ray tasks when a session is live."""
    os.makedirs(out_dir, exist_ok=True)
    ranges = [
        (lo, min(spec.n_repos, lo + repos_per_file))
        for lo in range(0, spec.n_repos, repos_per_file)
    ]
    missing = [
        (lo, hi) for lo, hi in ranges
        if not os.path.exists(os.path.join(out_dir, f"part-{lo:08d}.parquet"))
    ]
    try:
        import ray

        use_ray = ray.is_initialized() and len(missing) > 1
    except ImportError:
        use_ray = False
    if use_ray:
        import ray

        task = ray.remote(_write_shard)
        ray.get([task.remote(out_dir, spec, lo, hi) for lo, hi in missing])
    else:
        for lo, hi in missing:
            _write_shard(out_dir, spec, lo, hi)
    return [os.path.join(out_dir, f"part-{lo:08d}.parquet") for lo, _ in ranges]


# --- F3: hand-checked micro graph (p2p-31 analogue) ----------------------

MICRO_EDGES = [
    # community A: 0-4 (ring + chords, contains triangles 0-1-2, 1-2-3)
    (0, 1), (1, 2), (0, 2), (2, 3), (1, 3), (3, 4), (4, 0),
    # community B: 5-9 (star around 5 + triangle 5-6-7)
    (5, 6), (5, 7), (6, 7), (5, 8), (5, 9), (8, 9),
    # bridge between communities
    (4, 5),
    # 10 = dangling sink (in-edge only, no out-edges in the directed view)
    (3, 10), (7, 10),
    # 11 = isolated vertex: no edges (must still appear as a vertex)
]
MICRO_VERTICES = list(range(12))


def micro_edge_table(directed: bool = False) -> pa.Table:
    """The fixed 12-vertex/16-edge golden graph as an Arrow edge table."""
    src = [a for a, _ in MICRO_EDGES]
    dst = [b for _, b in MICRO_EDGES]
    return pa.table(
        {
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "weight": pa.array([1.0] * len(src), pa.float64()),
        }
    )
