"""Large-mesh end-to-end scaling demo (BASELINE.json config #5).

Generates a large synthetic duct mesh (default ~1M nodes), runs the full
pipeline — native-tensorizer ETL, RCB decomposition with overlap, padded
subdomain batches streamed through the device with host prefetch, overlap-
average reconstruction — and reports per-stage wall time plus end-to-end
nodes/sec.

Run:  python benchmarks/large_mesh.py [--nodes 1000000] [--width 48]
The device path uses the merged block-diagonal layout and chunks subdomains
to bound HBM (the per-edge operator peaks at ~9 KB/edge of transient state).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

_HERE = (os.path.dirname(os.path.abspath(__file__)) if "__file__" in globals()
         else os.getcwd())
sys.path.insert(0, os.path.dirname(_HERE) if _HERE.endswith("benchmarks") else _HERE)


@functools.lru_cache(maxsize=8)
def _recon_fn(n_points: int):
    """Cached jit: reshape + overlap-average in ONE dispatch (an eager
    ``out.reshape`` on the relay is its own ~0.5 s tunnel round-trip)."""
    import jax

    from fast_eng_super_resolution_tpu.data.reconstruct import (
        make_overlap_average_device)

    avg = make_overlap_average_device(n_points)

    @jax.jit
    def fn(out, gids, weights):
        return avg(out.reshape(-1, out.shape[-1]), gids, weights)

    return fn


def _reconstruct(out, batch, n_points: int) -> np.ndarray:
    """Overlap-average device reconstruction shared by both lanes.

    Relies on pad_batch_to_multiple's convention: padded rows reuse graph 0's
    global_ids but node_mask zeroes their weights, so the clamp + mask pair
    is the single encoding of that contract for every lane.  ``batch`` is
    host numpy in both lanes, so gids/weights are prepared host-side — no
    eager device dispatches inside the timed reconstruction span.
    """
    gids = np.maximum(np.asarray(batch.global_ids).reshape(-1), 0).astype(np.int32)
    weights = np.asarray(batch.node_mask).reshape(-1).astype(np.float32)
    return np.asarray(_recon_fn(n_points)(out, gids, weights))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--nodes", type=int, default=1_000_000)
    parser.add_argument("--width", type=int, default=48)
    parser.add_argument("--subdomains", type=int, default=64)
    parser.add_argument("--chunk", type=int, default=2,
                        help="subdomains per device step")
    parser.add_argument("--fused", action="store_true",
                        help="run the fused Pallas conv path (per-chunk "
                             "merged groups + host-built scatter blocks — "
                             "the scheduler's production serving kernel) "
                             "instead of the XLA edge3d path")
    args = parser.parse_args()

    import jax

    from fast_eng_super_resolution_tpu.utils.env import setup_compilation_cache

    setup_compilation_cache()

    from fast_eng_super_resolution_tpu.core.graph import merge_batch, pad_and_bucket
    from fast_eng_super_resolution_tpu.data.partition import extract_subdomains
    from fast_eng_super_resolution_tpu.data.synthetic import duct_field, make_duct_mesh
    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN

    n_side = int(round((args.nodes / 4) ** (1 / 3)))
    dims = (4 * n_side, n_side, n_side)
    t0 = time.perf_counter()
    mesh = make_duct_mesh(*dims)
    v, p = duct_field(mesh.points)
    y = np.concatenate([v, p], 1)
    t_mesh = time.perf_counter() - t0
    print(f"mesh: {len(mesh.points):,} nodes, {len(mesh.cells):,} cells "
          f"({t_mesh:.1f}s)")

    t0 = time.perf_counter()
    subs = extract_subdomains(mesh.points, mesh.cells, y, y, args.subdomains,
                              "all_intersecting")
    t_part = time.perf_counter() - t0
    n_edges = sum(len(s.senders) for s in subs)
    print(f"partition: {len(subs)} subdomains, {n_edges:,} edges ({t_part:.1f}s)")

    raw = [dict(x=g.x, y=g.y, pos=g.pos, senders=g.senders, receivers=g.receivers,
                edge_attr=g.edge_attr, global_ids=g.global_node_ids) for g in subs]
    t0 = time.perf_counter()
    # HOST-SIDE end-to-end: to_device=True here cost an upload of the full
    # padded batch followed by an immediate device_get (59.6 s of the 250k
    # run's 'pad/bucket' stage was that round trip); numpy leaves also keep
    # chunk slicing and fused prep off the tunnel entirely
    (_, order, batch), = pad_and_bucket(raw, to_device=False)
    from fast_eng_super_resolution_tpu.parallel.mesh import pad_batch_to_multiple

    # mask-zeroed tail padding so the chunk count divides evenly (dropped
    # empty partitions make len(subs) ragged vs --chunk)
    batch, _ = pad_batch_to_multiple(batch, args.chunk)
    chunks = []
    for s in range(0, batch.x.shape[0], args.chunk):
        sl = slice(s, s + args.chunk)
        chunks.append(jax.tree_util.tree_map(lambda a: a[sl], batch))
    t_pad = time.perf_counter() - t0
    print(f"pad/bucket: {batch.x.shape} ({t_pad:.1f}s)")

    n_chunks = batch.x.shape[0] // args.chunk
    if args.fused:
        # branch BEFORE the XLA lane's full-batch device upload below — at
        # 1M+ nodes that stack is GBs of HBM and untimed tunnel dispatches
        # the fused lane never uses
        return run_fused(args, mesh, batch, n_chunks, t_part)

    model = KernelNN(width=args.width, ker_width=args.width, depth=5, ker_in=1,
                     in_width=4, out_width=4)
    params = model.init(jax.random.PRNGKey(0))

    import jax.numpy as jnp

    # all chunks in ONE program: lax.map keeps the per-chunk transient bounded
    # while avoiding per-chunk dispatch (a round trip per chunk dominates over
    # the axon tunnel; one dispatch is also the right shape for real pods)
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *chunks)

    @jax.jit
    def run_all(params, stacked):
        def one(chunk):
            b, n = chunk.x.shape[0], chunk.x.shape[1]
            merged, _ = merge_batch(chunk)
            out = model.apply(params, merged.x, merged.senders, merged.receivers,
                              merged.edge_attr, edge_mask=merged.edge_mask)
            return out.reshape(b, n, -1)

        return jax.lax.map(one, stacked)

    out = run_all(params, stacked)  # warm compile (also feeds reconstruction)
    float(jnp.sum(out))

    # honest timing: chain iterations so no execution is byte-identical —
    # the axon relay serves repeated identical executions from cache
    # (CLAUDE.md; same pattern as bench.py)
    import dataclasses as _dc

    ITERS = 3

    @jax.jit
    def chained(params, stacked):
        x0 = stacked.x

        def body(x, _):
            o = run_all(params, _dc.replace(stacked, x=x))  # jit inlines
            return o * 1e-3 + x0, None

        x, _ = jax.lax.scan(body, x0, None, length=ITERS)
        return x

    chained(params, stacked).block_until_ready()  # warm
    t0 = time.perf_counter()
    checksum = float(jnp.sum(chained(params, stacked)))  # host sync
    t_infer = (time.perf_counter() - t0) / ITERS
    assert np.isfinite(checksum)

    # device-side overlap averaging: one segment-sum over all padded nodes,
    # transfer only the final [num_nodes, C] field
    t0 = time.perf_counter()
    recon = _reconstruct(out, batch, len(mesh.points))
    t_recon = time.perf_counter() - t0

    total_nodes = len(mesh.points)
    print(f"inference: {t_infer:.2f}s  ({total_nodes / t_infer:,.0f} nodes/s)")
    print(f"reconstruction: {t_recon:.2f}s")
    print(f"end-to-end (part+infer+recon): "
          f"{total_nodes / (t_part + t_infer + t_recon):,.0f} nodes/s")
    assert np.isfinite(recon).all()


def run_fused(args, mesh, batch, n_chunks: int, t_part: float):
    """Fused-kernel variant of the device stage: per-chunk merged groups +
    host-built scatter blocks (parallel.train.make_fused_shard_batches —
    the same prep the scheduler's production serving path uses), all groups
    through ONE jitted lax.map of the fused Pallas conv."""
    import jax
    import jax.numpy as jnp

    from fast_eng_super_resolution_tpu.models.kernelnn import KernelNN
    from fast_eng_super_resolution_tpu.ops.fused_conv import expand_s
    from fast_eng_super_resolution_tpu.parallel.train import (
        make_fused_shard_batches)

    model = KernelNN(width=args.width, ker_width=args.width, depth=5,
                     ker_in=1, in_width=4, out_width=4)
    params = model.init(jax.random.PRNGKey(0))

    t0 = time.perf_counter()
    host_batch = jax.tree_util.tree_map(np.asarray, batch)
    # expand_s=False: S rides as compact generators and expands PER CHUNK
    # inside the program — resident HBM holds one chunk's S transient, not
    # the whole mesh's (stacked dense S at 1M nodes is 5.2 GB and OOMs the
    # 16 GB chip well before 4M)
    batchd, rb, bk = make_fused_shard_batches(host_batch, model, n_chunks,
                                              with_graph=False,
                                              expand_s=False)
    b, n = batch.x.shape[0], batch.x.shape[1]
    per = b // n_chunks
    x_st = jnp.asarray(host_batch.x.reshape(n_chunks, per * n, -1))
    ea = jnp.asarray(batchd["fused"]["edge_attr"])
    sp = jnp.asarray(batchd["fused"]["aux"]["senders_perm"])
    sr = batchd["fused"]["s_compact"]["slot_rows"]
    rw = batchd["fused"]["s_compact"]["row_weight"]
    t_prep = time.perf_counter() - t0
    print(f"fused prep: rows_blk={rb} blk={bk} ({t_prep:.1f}s)")

    interp = jax.default_backend() not in ("tpu", "axon")

    # operands are jit ARGS, not closures: closed-over device arrays embed
    # as HLO constants and blow the remote-compile request limit (HTTP 413,
    # CLAUDE.md)
    @jax.jit
    def run_all(params, x_st, ea, sp, sr, rw):
        def one(operands):
            xm, ea_c, sp_c, sr_c, rw_c = operands
            sm_c = expand_s(sr_c, rw_c, rows_blk=rb, blk=bk)
            return model.apply_fused(params, xm, ea_c, sp_c, sm_c,
                                     rows_blk=rb, blk=bk, interpret=interp)

        return jax.lax.map(one, (x_st, ea, sp, sr, rw))

    out = run_all(params, x_st, ea, sp, sr, rw)
    float(jnp.sum(out))

    ITERS = 3

    @jax.jit
    def chained(params, x0, ea, sp, sr, rw):
        def body(x, _):
            o = run_all(params, x, ea, sp, sr, rw)
            return o[..., : x0.shape[-1]] * 1e-3 + x0, None

        x, _ = jax.lax.scan(body, x0, None, length=ITERS)
        return x

    chained(params, x_st, ea, sp, sr, rw).block_until_ready()
    t0 = time.perf_counter()
    checksum = float(jnp.sum(chained(params, x_st, ea, sp, sr, rw)))
    t_infer = (time.perf_counter() - t0) / ITERS
    assert np.isfinite(checksum)

    t0 = time.perf_counter()
    # block-diagonal group layout: [n_chunks, per*n, C] -> padded node rows
    # align with batch.global_ids / node_mask reshaped the same way
    recon = _reconstruct(out, batch, len(mesh.points))
    t_recon = time.perf_counter() - t0

    total_nodes = len(mesh.points)
    print(f"inference (fused): {t_infer:.2f}s  "
          f"({total_nodes / t_infer:,.0f} nodes/s)")
    print(f"reconstruction: {t_recon:.2f}s")
    # prep (scatter-block build + upload, ~5 GB at 1M nodes) is a real
    # per-geometry cost of this lane — report e2e both ways: steady-state
    # (operands cached, like the scheduler's serving path) and cold
    print(f"end-to-end steady-state (part+infer+recon): "
          f"{total_nodes / (t_part + t_infer + t_recon):,.0f} nodes/s")
    print(f"end-to-end cold (+prep): "
          f"{total_nodes / (t_part + t_prep + t_infer + t_recon):,.0f} nodes/s")
    assert np.isfinite(recon).all()


if __name__ == "__main__":
    main()
