#!/usr/bin/env python3
"""Independent cross-check for the three queries DuckDB cannot express
(q48 multimodal byte stats, q49 FFT features, q50 PCA components).

The driver's correctness gate records them as `no_oracle`; this harness
closes that gap by recomputing each result with NumPy — a different
implementation of the same published math (numpy.fft vs the repo's
radix-2 Cooley-Tukey; numpy.linalg.eigh on the sample covariance vs
MLlib PCA; plain Python byte stats vs the mapPartitions kernel) — and
comparing against the parquet dumps graft.Verify wrote.

Usage: python3 tools/check_ml.py [sf_dir] [verify_out] [report_json]
Exit 0 = every row of every query matches within rounding tolerance.
"""
import sys, json, math
import duckdb
import numpy as np

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
report = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/ML_ORACLE_r3.json"

con = duckdb.connect()
results = {}

def spark_rows(name, order_cols):
    return con.execute(
        f"SELECT * FROM '{out_dir}/{name}/*.parquet' ORDER BY {order_cols}"
    ).fetchall()

# ---------------------------------------------------------------- q49 ----
# FFT features per user over the time-ordered event-value signal.
# Ordering replicates sort_array(collect_list(struct(ts, event_id, value)))
# on the µs-truncated timestamp: (ts_ns // 1000, event_id, value).
def check_q49():
    ev = con.execute(f"""
        SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id, value
        FROM '{sf_dir}/events.parquet' WHERE value IS NOT NULL
        ORDER BY user_id, ts_us, event_id, value""").fetchall()
    sig = {}
    for u, _, _, v in ev:
        sig.setdefault(u, []).append(v)
    mismatches = []
    rows = spark_rows("q49_fft_features", "user_id")
    for user_id, dom_freq, spec_energy in rows:
        x = np.asarray(sig[user_id], dtype=np.float64)
        n = 1
        while n < max(len(x), 1):
            n <<= 1
        X = np.fft.fft(x, n=n)
        mag = np.abs(X[: n // 2 + 1])
        # dominant freq: argmax over bins 1..n/2, ties -> lowest bin
        if len(x) < 2:
            df_np = 0.0
        else:
            best = 1 + int(np.argmax(mag[1:]))
            df_np = 0.0 if mag[best] == 0.0 else best * 1.0 / n
        se_np = float(np.sum(np.abs(X) ** 2) / n)
        ok_df = abs(dom_freq - round(df_np, 6)) <= 1e-9
        if not ok_df:
            # argmax near-tie guard: accept if Spark's bin has (numerically)
            # the same magnitude as numpy's best bin
            k = int(round(dom_freq * n))
            ok_df = 0 < k <= n // 2 and abs(mag[k] - mag[best]) <= 1e-9 * max(mag[best], 1.0)
        ok_se = abs(spec_energy - se_np) <= 2e-4 + 1e-9 * abs(se_np)
        if not (ok_df and ok_se):
            mismatches.append({"user_id": user_id, "spark": [dom_freq, spec_energy],
                               "numpy": [round(df_np, 6), round(se_np, 4)]})
    return {"rows": len(rows), "mismatches": mismatches,
            "ok": len(rows) > 0 and not mismatches}

# ---------------------------------------------------------------- q50 ----
# PCA(3) per embedding. MLlib: eigenvectors of the SAMPLE covariance
# (centered, n-1), transform multiplies the RAW (uncentered) vectors.
# Components are sign-ambiguous -> compare each column up to global sign.
def check_q50():
    emb = con.execute(f"""
        SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet'
        ORDER BY vec_id""").fetchall()
    ids = [r[0] for r in emb]
    X = np.asarray([r[1] for r in emb], dtype=np.float64)
    C = np.cov(X, rowvar=False, ddof=1)
    w, V = np.linalg.eigh(C)
    order = np.argsort(w)[::-1][:3]
    proj = X @ V[:, order]  # (n, 3), uncentered like MLlib transform
    rows = spark_rows("q50_pca_components", "vec_id")
    assert [r[0] for r in rows] == ids, "vec_id set mismatch"
    S = np.asarray([[r[1], r[2], r[3]] for r in rows], dtype=np.float64)
    mismatches = []
    for j in range(3):
        d_pos = np.max(np.abs(S[:, j] - proj[:, j]))
        d_neg = np.max(np.abs(S[:, j] + proj[:, j]))
        # 4-dp rounding on the Spark side -> 5e-5 quantization + slack
        if min(d_pos, d_neg) > 2e-3:
            mismatches.append({"component": j + 1,
                               "max_abs_diff": float(min(d_pos, d_neg))})
    return {"rows": len(rows), "mismatches": mismatches,
            "ok": len(rows) > 0 and not mismatches}

# ---------------------------------------------------------------- q48 ----
# Multimodal byte stats over the deterministic synthetic media table
# (Multimodal.synthMedia/extractFeatures), joined with embeddings.
def check_q48():
    labels = dict(con.execute(
        f"SELECT vec_id, label FROM '{sf_dir}/embeddings.parquet'").fetchall())
    mismatches = []
    rows = spark_rows("q48_multimodal_features", "media_id")
    for media_id, kind, n_px, byte_mean, byte_entropy, label in rows:
        mid = media_id
        kind_np = "audio" if mid % 3 == 2 else "image"
        w, h = 8 + mid % 5, 8 + mid % 3
        plen = 64 + (mid % 17) * 7
        # image payloads are real PNGs of this formula grid (lossless
        # decode); audio is the raw formula bytes as 8-bit PCM
        npx = max(w * h, 1) if kind_np == "image" else plen
        pixels = [(mid * 131 + (i % plen) * 31 + 7) % 251 for i in range(npx)]
        hist = [0] * 16
        for p in pixels:
            hist[p // 16] += 1
        mean_np = sum(pixels) / npx
        ent_np = -sum((c / npx) * math.log(c / npx) for c in hist if c > 0)
        ok = (kind == kind_np and n_px == npx
              and abs(byte_mean - mean_np) <= 2e-4
              and abs(byte_entropy - ent_np) <= 2e-4
              and label == labels.get(mid))
        if not ok:
            mismatches.append({"media_id": mid,
                               "spark": [kind, n_px, byte_mean, byte_entropy, label],
                               "python": [kind_np, npx, round(mean_np, 4),
                                          round(ent_np, 4), labels.get(mid)]})
    return {"rows": len(rows), "mismatches": mismatches,
            "ok": len(rows) > 0 and not mismatches}

checks = {"q48_multimodal_features": check_q48,
          "q49_fft_features": check_q49,
          "q50_pca_components": check_q50}
fails = 0
for name, fn in checks.items():
    try:
        r = fn()
    except Exception as e:  # noqa: BLE001 — report, don't crash the gate
        r = {"rows": 0, "mismatches": [], "ok": False, "err": repr(e)}
    results[name] = r
    status = "OK  " if r["ok"] else "FAIL"
    print(f"{status} {name} ({r['rows']} rows, {len(r['mismatches'])} mismatches)")
    if not r["ok"]:
        fails += 1
        for m in r["mismatches"][:5]:
            print("     ", m)

with open(report, "w") as f:
    json.dump(results, f, indent=2, default=str)
print(f"report -> {report}")
sys.exit(1 if fails else 0)
