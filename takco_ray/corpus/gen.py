"""Seeded generator for the synthetic code corpus (FIXTURES.md).

Planted structure (ground truth by construction):

- **singletons** — unique files, their own entity (majority);
- **clone clusters** — 2-6 files per entity: mutations (token substitutions,
  line insert/delete, trailing comment churn) of one template, calibrated so
  intra-entity 5-token-shingle Jaccard ≥ ~0.8 while distinct templates share
  ~no shingles (margin around the LSH threshold 0.5, mirroring the reference's
  ``takco/cluster/matchers/lsh.py:36-37``);
- **exact duplicates** — byte-identical content under different (repo, path)
  (exercises sha256 dedup, SURVEY.md §2.7 D2);
- **confusers** — singleton files derived from a cluster template with heavy
  spread-out mutation calibrated to shingle Jaccard ≈ 0.5: high enough to
  sometimes share an LSH band with the cluster (same-block *negative* pairs
  for the F1 gate) but below the scoring threshold;
- **hot boilerplate block** — one entity stamped across ~5 % of all files with
  near-identical content, creating a deliberately skewed LSH block (the
  reference's 492k-row header-union symptom, ``docs/tutorials/wikitables.ipynb``).

Sidecars:

- ``labels``: (repo, path, commit, file_id, entity_id, sha256) — per-row
  invariant + cluster gold;
- ``labeled_pairs``: (id1, id2, same_block, is_match) — ``same_block`` is
  computed with the SAME seeded MinHash/band parameters the engine defaults
  to, *pre-salting*, as the north rule's F1 is over labeled same-block pairs.

Everything is ``numpy.random.RandomState(seed)``-driven: regenerating yields
byte-identical Parquet (fixed row order, fixed schema, no timestamps).
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, asdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import stable_file_id
from ..functions.minhash import MinHasher, band_keys

SCALES = {"test": 2_000, "small": 20_000, "bench": 200_000, "bench4": 800_000}

_LANGS = ["py", "java", "js", "go", "c"]
_LANG_P = [0.4, 0.2, 0.2, 0.1, 0.1]

_LINE_FORMS = [
    "def {0}({1}, {2}):",
    "    {0} = {1}.{2}({3})",
    "    return {0} + {1}",
    "import {0}",
    "class {0}({1}):",
    "    for {0} in {1}:",
    "        {0}.append({1}({2}))",
    "    if {0} == {1}:",
]


@dataclass
class CorpusConfig:
    n_files: int = 2_000
    seed: int = 42
    frac_singleton: float = 0.55
    frac_cluster: float = 0.35  # entities of size 2-6
    frac_confuser: float = 0.05  # near-threshold singletons (J≈0.5 to a cluster)
    frac_hot: float = 0.05  # one giant boilerplate entity
    template_tokens: int = 300  # tokens per template (≈296 5-shingles)
    mutate_tokens: int = 4  # token substitutions per near-dup file
    exact_dup_prob: float = 0.25  # a cluster member is an exact copy
    rows_per_shard: int = 10_000
    num_perm: int = 128
    num_bands: int = 16
    shingle_k: int = 5
    minhash_seed: int = 41
    max_block_pairs: int = 256  # cap on labeled pairs emitted per block
    emit_pairs: bool = True  # False skips gold band membership (bench scales)
    # version of the engine's token-hash/minhash family; bumped when the
    # signature semantics change so cached fixtures (whose gold band
    # membership was computed with the old family) regenerate
    minhash_family: str = "wordhash-v4-u32"


def _vocab(rs: np.random.RandomState, n: int) -> list:
    # identifier-like tokens, unique by construction
    return [f"v{rs.randint(0, 1 << 30):x}_{i:x}" for i in range(n)]


def _render(tokens: list, rs: np.random.RandomState) -> str:
    """Render a token sequence as code-looking lines (2-4 tokens per line)."""
    n = len(tokens)
    # one RNG call for all line-form choices (per-line randint dominates
    # generation time at bench scales)
    form_idx = rs.randint(0, len(_LINE_FORMS), size=n)
    lines = []
    i = 0
    li = 0
    while i < n:
        form = _LINE_FORMS[form_idx[li]]
        li += 1
        need = form.count("{")
        args = [tokens[(i + j) % n] for j in range(need)]
        lines.append(form.format(*args))
        i += max(need, 1)
    return "\n".join(lines) + "\n"


def _substitute(tokens: list, n_subs: int, rs: np.random.RandomState, fresh: list) -> list:
    """Substitute tokens at random positions (identifier-rename mutations).

    Substitutions are LOCAL in the rendered token stream (each kills ≤k
    shingle windows); splice mutations must happen post-render (see
    :func:`_line_churn`) because shifting template tokens across line-form
    boundaries would change every downstream shingle.
    """
    out = list(tokens)
    for _ in range(n_subs):
        out[rs.randint(0, len(out))] = fresh[rs.randint(0, len(fresh))]
    return out


def _line_churn(text: str, rs: np.random.RandomState, fresh: list) -> str:
    """Insert a comment line and/or delete one line — local shingle damage."""
    lines = text.splitlines()
    op = rs.randint(0, 3)
    if op == 0 and len(lines) > 10:
        del lines[rs.randint(0, len(lines))]
    elif op == 1:
        pos = rs.randint(0, len(lines) + 1)
        words = " ".join(fresh[rs.randint(0, len(fresh))] for _ in range(3))
        lines.insert(pos, f"# {words}")
    return "\n".join(lines) + "\n"


def _mutate_spread(tokens: list, n_subs: int, k: int, rs: np.random.RandomState, fresh: list) -> list:
    """Substitute ``n_subs`` tokens at ≥k-spaced positions.

    Spacing guarantees each substitution destroys ~k shingles with no window
    overlap, so shingle Jaccard is predictable: J ≈ (S - k·n) / (S + k·n)
    for S original shingles — how confuser similarity (~0.5) is calibrated.
    """
    out = list(tokens)
    n = len(out)
    stride = max(k, n // max(1, n_subs))
    for i in range(n_subs):
        pos = (i * stride + rs.randint(0, max(1, stride - k))) % n
        out[pos] = fresh[rs.randint(0, len(fresh))]
    return out


def generate_corpus(out_dir: str, cfg: CorpusConfig) -> dict:
    """Write files/ labels/ labeled_pairs/ (+MANIFEST.json) under out_dir.

    Idempotent: if MANIFEST.json exists with the same config, returns it
    without regenerating (fixture reuse across test sessions).
    """
    manifest_path = os.path.join(out_dir, "MANIFEST.json")
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        if m.get("config") == asdict(cfg):
            return m
        if not cfg.emit_pairs and not m.get("config", {}).get("emit_pairs", True):
            # without gold pairs the minhash family never touches the output:
            # content depends only on the non-minhash fields, so a family
            # bump must not force a multi-GB bench-corpus regeneration
            mh_fields = {"num_perm", "num_bands", "shingle_k", "minhash_seed", "max_block_pairs", "minhash_family"}
            a = {k: v for k, v in asdict(cfg).items() if k not in mh_fields}
            b = {k: v for k, v in m.get("config", {}).items() if k not in mh_fields}
            if a == b:
                return m

    rs = np.random.RandomState(cfg.seed)
    n = cfg.n_files
    n_hot = max(0, int(n * cfg.frac_hot))
    n_cluster_files = int(n * cfg.frac_cluster)
    n_conf = int(n * cfg.frac_confuser)
    n_single = n - n_hot - n_cluster_files - n_conf

    repos: list = []
    paths: list = []
    commits: list = []
    langs: list = []
    contents: list = []
    entity_ids: list = []

    fresh_vocab = _vocab(rs, 4096)

    lang_pick = rs.choice(5, size=n + 8, p=_LANG_P)  # one vectorized draw

    def add_file(entity: int, tokens: list, exact_of: str | None, render_seed: int):
        # a fresh RandomState per render with an entity-stable seed makes every
        # member of an entity use the SAME line-form interleaving — the token
        # stream differs only at mutated positions, keeping Jaccard calibrated
        i = len(repos)
        repos.append(f"org{i % 97}/repo{i % 9973}")
        paths.append(f"src/mod_{i % 51}/file_{i}.{_LANGS[int(lang_pick[i % len(lang_pick)])]}")
        commits.append(hashlib.sha1(f"c{entity}:{i}:{cfg.seed}".encode()).hexdigest()[:12])
        langs.append(paths[-1].rsplit(".", 1)[1])
        contents.append(
            exact_of
            if exact_of is not None
            else _render(tokens, np.random.RandomState(render_seed))
        )
        entity_ids.append(entity)

    entity = 0
    # singletons
    for _ in range(n_single):
        toks = [fresh_vocab[j] for j in rs.randint(0, len(fresh_vocab), cfg.template_tokens)]
        add_file(entity, toks, None, cfg.seed + 7 * entity + 1)
        entity += 1

    # clone clusters (size 2-6)
    cluster_templates: list = []
    placed = 0
    while placed < n_cluster_files:
        size = int(rs.randint(2, 7))
        size = min(size, n_cluster_files - placed)
        if size < 2:
            break
        template = [fresh_vocab[j] for j in rs.randint(0, len(fresh_vocab), cfg.template_tokens)]
        render_seed = cfg.seed + 7 * entity + 3
        base = _render(template, np.random.RandomState(render_seed))
        add_file(entity, template, base, render_seed)
        for _m in range(size - 1):
            if rs.rand() < cfg.exact_dup_prob:
                add_file(entity, template, base, render_seed)  # exact duplicate
            else:
                mt = _substitute(template, cfg.mutate_tokens, rs, fresh_vocab)
                text = _line_churn(
                    _render(mt, np.random.RandomState(render_seed)), rs, fresh_vocab
                )
                add_file(entity, mt, text, render_seed)
        placed += size
        cluster_templates.append((template, render_seed))
        entity += 1

    # pad any cluster-size remainder with singletons so n_files is exact
    for _ in range(n_cluster_files - placed):
        toks = [fresh_vocab[j] for j in rs.randint(0, len(fresh_vocab), cfg.template_tokens)]
        add_file(entity, toks, None, cfg.seed + 7 * entity + 1)
        entity += 1

    # confusers: singleton entities at shingle-Jaccard ≈ 0.5 to a cluster
    # template — J = (S-kn)/(S+kn) = 0.5 at n = S/(3k) substitutions, where S
    # counts shingles of the RENDERED stream (line forms interleave ~0.4 extra
    # tokens per template token, so S is measured, not assumed)
    from ..functions.tokenize import tokenize

    for _ in range(n_conf):
        src, src_render_seed = cluster_templates[rs.randint(0, len(cluster_templates))]
        n_stream = len(tokenize(_render(src, np.random.RandomState(src_render_seed))))
        n_subs = max(1, (n_stream - cfg.shingle_k + 1) // (3 * cfg.shingle_k))
        mt = _mutate_spread(src, n_subs, cfg.shingle_k, rs, fresh_vocab)
        add_file(entity, mt, None, src_render_seed)
        entity += 1

    # hot boilerplate block (one entity, near-identical members)
    if n_hot:
        template = [fresh_vocab[j] for j in rs.randint(0, len(fresh_vocab), cfg.template_tokens)]
        base = _render(template, np.random.RandomState(cfg.seed + 11))
        for k in range(n_hot):
            if k % 3 == 0:
                add_file(entity, template, base, cfg.seed + 11)  # exact copies
            else:
                mt = list(template)
                mt[rs.randint(0, len(mt))] = fresh_vocab[rs.randint(0, len(fresh_vocab))]
                add_file(entity, mt, None, cfg.seed + 11)
        entity += 1

    file_ids = stable_file_id(repos, paths, commits)
    assert len(set(file_ids.tolist())) == len(file_ids), "file_id collision in fixture"
    sha = [hashlib.sha256(c.encode()).hexdigest() for c in contents]

    # ---- write files shards (engine input: NO label columns) -------------
    files_dir = os.path.join(out_dir, "files")
    os.makedirs(files_dir, exist_ok=True)
    schema = pa.schema(
        [
            ("repo", pa.string()),
            ("path", pa.string()),
            ("commit", pa.string()),
            ("lang", pa.string()),
            ("content", pa.large_string()),
        ]
    )
    total_bytes = 0
    for s0 in range(0, len(repos), cfg.rows_per_shard):
        s1 = min(s0 + cfg.rows_per_shard, len(repos))
        t = pa.table(
            {
                "repo": repos[s0:s1],
                "path": paths[s0:s1],
                "commit": commits[s0:s1],
                "lang": langs[s0:s1],
                "content": pa.array(contents[s0:s1], type=pa.large_string()),
            },
            schema=schema,
        )
        # small row groups let Ray split a shard into multiple read blocks,
        # so read/signature parallelism scales with CPUs, not shard count
        pq.write_table(
            t,
            os.path.join(files_dir, f"shard_{s0 // cfg.rows_per_shard:05d}.parquet"),
            row_group_size=2048,
        )
        total_bytes += t.nbytes

    # ---- labels sidecar ---------------------------------------------------
    labels = pa.table(
        {
            "repo": repos,
            "path": paths,
            "commit": commits,
            "file_id": pa.array(file_ids, type=pa.int64()),
            "entity_id": pa.array(entity_ids, type=pa.int64()),
            "sha256": sha,
        }
    )
    pq.write_table(labels, os.path.join(out_dir, "labels.parquet"))

    # ---- labeled same-block pairs (pre-salting band membership) ----------
    pairs: list = []
    hot_sizes: list = []
    ent = np.asarray(entity_ids)
    if cfg.emit_pairs:
        pairs, hot_sizes = _gold_pairs(contents, file_ids, cfg)
    lp = pa.table(
        {
            "id1": pa.array([int(file_ids[a]) for a, _ in pairs], type=pa.int64()),
            "id2": pa.array([int(file_ids[b]) for _, b in pairs], type=pa.int64()),
            "same_block": pa.array([True] * len(pairs)),
            "is_match": pa.array([bool(ent[a] == ent[b]) for a, b in pairs]),
        }
    )
    pq.write_table(lp, os.path.join(out_dir, "labeled_pairs.parquet"))

    ent_sizes = np.bincount(np.asarray(entity_ids))
    manifest = {
        "config": asdict(cfg),
        "n_files": len(repos),
        "n_entities": int(entity),
        "bytes": int(total_bytes),
        "n_labeled_pairs": len(pairs),
        "n_match_pairs": int(sum(1 for a, b in pairs if ent[a] == ent[b])),
        "hot_block_sizes": sorted(hot_sizes, reverse=True)[:5],
        "entity_size_histogram": {
            str(k): int(v) for k, v in zip(*np.unique(ent_sizes[ent_sizes > 0], return_counts=True))
        },
    }
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    return manifest


def _gold_pairs(contents, file_ids, cfg: CorpusConfig):
    """Same-block pair enumeration with the engine's own band parameters."""
    mh = MinHasher(num_perm=cfg.num_perm, shingle_k=cfg.shingle_k, seed=cfg.minhash_seed)
    sigs = np.empty((len(contents), cfg.num_perm), dtype=np.uint64)
    for s0 in range(0, len(contents), 4096):
        s1 = min(s0 + 4096, len(contents))
        sigs[s0:s1] = mh.signatures(contents[s0:s1])
    bands = band_keys(sigs, cfg.num_bands, seed=cfg.minhash_seed)

    buckets: dict = {}
    for i in range(len(contents)):
        for b in bands[i]:
            buckets.setdefault(int(b), []).append(i)
    pair_set = set()
    hot_sizes = []
    prs = np.random.RandomState(cfg.seed + 99)
    for key, members in buckets.items():
        m = len(members)
        if m < 2:
            continue
        if m * (m - 1) // 2 <= cfg.max_block_pairs:
            for x in range(m):
                for y in range(x + 1, m):
                    a, b = members[x], members[y]
                    pair_set.add((a, b) if file_ids[a] < file_ids[b] else (b, a))
        else:
            hot_sizes.append(m)
            # deterministic sample of pairs from the hot block
            idx = prs.randint(0, m, size=(cfg.max_block_pairs, 2))
            for a_i, b_i in idx:
                if a_i == b_i:
                    continue
                a, b = members[a_i], members[b_i]
                pair_set.add((a, b) if file_ids[a] < file_ids[b] else (b, a))
    pairs = sorted(pair_set, key=lambda p: (int(file_ids[p[0]]), int(file_ids[p[1]])))
    return pairs, hot_sizes


def main():
    import argparse

    p = argparse.ArgumentParser(description="generate synthetic code corpus")
    p.add_argument("--scale", choices=sorted(SCALES), default="test")
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()
    cfg = CorpusConfig(n_files=SCALES[args.scale], seed=args.seed)
    m = generate_corpus(args.out, cfg)
    print(json.dumps(m, indent=2, sort_keys=True))


if __name__ == "__main__":
    main()
