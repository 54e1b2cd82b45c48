"""Experiment driver — the equivalent of the reference's main.py run loop.

Replicates (reference main.py:16-321):
  * partition decision: E >= metis_threshold -> num_parts = ceil(E/threshold),
    q = threshold * sample_perc; else q = E * sample_perc (main.py:41-54)
  * cluster batches shuffled every epoch (ClusterLoader(shuffle=True))
  * per-run model + dual-optimizer init; epoch loop with timing
  * ensemble eval per epoch; best-val checkpoint (+ its temperature)
  * convergence early-stop: std(last 5 losses) < cfg.convergence
  * final reload of the best params + ensemble eval; [stats] line; CSV sink
  * multi-run mean +/- std summary

TPU-native deltas: params checkpoint via flax serialization instead of
torch.save; per-batch steps are pre-compiled jitted functions (one for the
sampled path, one for the small-batch full path) chosen on host by each
batch's valid edge count — the jit-friendly version of the reference's
dynamic `batch.edge_index.shape[1] > q` branch. With ``scan_epoch=auto``
(default) the whole epoch further collapses into ONE device-side lax.scan
over the stacked batches, the host decision becoming a per-batch
lax.switch — 117 dispatches/epoch -> 1 at Reddit scale, halving the
steady-state epoch (PERF.md r4).
"""
from __future__ import annotations

import csv
import os
import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import Config
from ..core.graph import Graph
from ..data.registry import get_dataset, HostDataset
from ..data.partition import partition_nodes, induced_subgraphs
from ..models import get_model, init_params
from ..train import DualOptimizer, make_train_step
from ..eval import make_eval_step, aggregate_eval, accumulate_eval_device


@dataclass
class RunResult:
    best_val_f1: float = 0.0
    best_test_f1: float = 0.0          # best test seen during training
    test_at_best_val: float = 0.0
    final_test_f1: float = 0.0         # after reloading best-val params
    final_train_f1: float = 0.0
    final_val_f1: float = 0.0
    train_time_sec: float = 0.0
    mean_epoch_time: float = 0.0
    num_iterations: int = 0
    conditional_updates: int = 0
    total_updates: int = 0
    losses: List[float] = field(default_factory=list)
    train_curve: List[float] = field(default_factory=list)
    val_curve: List[float] = field(default_factory=list)
    test_curve: List[float] = field(default_factory=list)


def want_tile_index(cfg: Config) -> bool:
    """Static decision: build the tile-pair edge index at graph prep?

    The fused tile-score kernel (ops/score_tiles.py) serves the
    hybrid_rescore sampling pass only; 'auto' restricts it to TPU backends
    (elsewhere scoring via XLA is faster than the portable tile fallback)."""
    if cfg.tile_index == "off":
        return False
    if not (cfg.mode == "learned" and cfg.pipeline == "hybrid"
            and cfg.hybrid_rescore and cfg.nhid <= 512):
        return False
    if cfg.data_parallel == "on" or cfg.halo:
        # the scalar-prefetch BlockSpec grid is not shard_map-portable yet;
        # sharded paths score via XLA (logged by log_fastpath_status)
        return False
    from ..core.fastpath import pallas_enabled
    if not pallas_enabled():
        # TP-sharded params in this process (core/fastpath.py)
        return False
    if cfg.tile_index == "on":
        return True
    return jax.default_backend() == "tpu"


def prepare_batches(cfg: Config, ds: HostDataset):
    """Partition decision + batch materialization (main.py:41-67)."""
    e = ds.num_edges
    use_partition = e >= cfg.metis_threshold
    tiles = want_tile_index(cfg)
    if use_partition:
        num_parts = cfg.num_partitions or int(np.ceil(e / cfg.metis_threshold))
        q = int(cfg.metis_threshold * cfg.sample_perc)
        part = partition_nodes(ds.edge_index, ds.num_nodes, num_parts,
                               method="native")
        # the degree-capped packer may leave some partitions unused
        # (num_parts is a ceiling, like METIS's nparts); drop them so no
        # empty padded batches are materialized. NOT under data_parallel:
        # run_experiment_parallel rounds num_parts up to a device multiple
        # and groups batches n_dev at a time for shard_map — compaction
        # would leave the final group short (empty partitions are harmless
        # there: all-padding shards contribute zero loss/grads/eval).
        used = np.unique(part)
        if used.size < num_parts and cfg.data_parallel != "on":
            remap = np.full(num_parts, -1, np.int32)
            remap[used] = np.arange(used.size, dtype=np.int32)
            part = remap[part]
            num_parts = int(used.size)
        # data_parallel stacks n_dev batches per shard_map group, which
        # needs ONE uniform padded shape; the sequential/scan driver can
        # class the padded shapes (data/partition.py shape_class_targets)
        classes = 1 if cfg.data_parallel == "on" else cfg.shape_classes
        batches = induced_subgraphs(ds.x, ds.edge_index, ds.y, ds.train_mask,
                                    ds.val_mask, ds.test_mask, part,
                                    num_parts, tile_index=tiles,
                                    shape_classes=classes)
    else:
        q = int(e * cfg.sample_perc)
        batches = [Graph.build(ds.x, ds.edge_index, ds.y, ds.train_mask,
                               ds.val_mask, ds.test_mask, prob=ds.prob,
                               num_classes=ds.num_classes,
                               sort_by_receiver=True, tile_index=tiles)]
    return batches, q


def log_fastpath_status(cfg: Config, batches, q: int, log_fn):
    """One line per TPU fast path saying whether it is engaged and why not —
    silent fallbacks (tile layout declined, head too wide, dense route off,
    scatter kernel off) otherwise shed >1.5x of perf with no trace in
    [stats]."""
    g0 = batches[0]
    backend = jax.default_backend()
    # fused tile-pair score kernel (ops/score_tiles.py)
    if cfg.mode != "learned" or cfg.pipeline != "hybrid" \
            or not cfg.hybrid_rescore:
        tile_s = "off (serves the learned hybrid_rescore path only)"
    elif cfg.data_parallel == "on" or cfg.halo:
        tile_s = "off (sharded paths score via XLA)"
    elif cfg.tile_index == "off":
        tile_s = "off (--tile_index off)"
    elif cfg.nhid > 512:
        tile_s = f"off (nhid={cfg.nhid} > 512: h tiles exceed VMEM budget)"
    elif cfg.tile_index == "auto" and backend != "tpu":
        tile_s = f"off (tile_index=auto on backend={backend})"
    elif g0.tile_t == 0:
        tile_s = "off (tile layout declined: padded slots would exceed " \
                 "1.35x E — graph too tile-sparse)"
    else:
        slots = g0.tile_ls.shape[0]
        tile_s = (f"on (t={g0.tile_t} b={g0.tile_b} slots={slots} "
                  f"overhead={slots / max(g0.num_edges, 1):.2f}x)")
    log_fn(f"[fastpath] tile_score_kernel={tile_s}")
    # dense-subgraph route (ops/dense_graph.py)
    from ..ops.dense_graph import use_dense_subgraph, dense_supported
    use_rand = cfg.conditional or cfg.sparse_edge_mlp
    if cfg.mode != "learned":
        dense_s = "off (learned mode only)"
    elif not use_rand:
        dense_s = "off (needs conditional or sparse_edge_mlp)"
    elif not dense_supported(cfg.GNN, cfg.edge_mlp_type):
        dense_s = f"off (no dense route for GNN={cfg.GNN}/" \
                  f"scorer={cfg.edge_mlp_type})"
    elif use_dense_subgraph(cfg, g0.num_nodes, q):
        dense_s = f"on (N={g0.num_nodes}: subgraph aggregation as " \
                  f"(N,N) MXU matmuls)"
    elif cfg.dense_subgraph == "off":
        dense_s = "off (--dense_subgraph off)"
    elif g0.num_nodes > cfg.dense_threshold:
        dense_s = f"off (N={g0.num_nodes} > dense_threshold=" \
                  f"{cfg.dense_threshold})"
    elif cfg.dense_subgraph == "auto" and backend != "tpu":
        dense_s = f"off (dense_subgraph=auto on backend={backend})"
    else:
        dense_s = f"off (E={g0.num_edges} < 4N: too sparse to amortize " \
                  f"the adjacency build)"
    log_fn(f"[fastpath] dense_subgraph={dense_s}")
    # blocked one-hot scatter kernel inside SpMM (ops/spmm.py _scatter_rows)
    # — the engage decision is the kernels' own working-set model, so this
    # line cannot drift from what actually compiles
    from ..ops.scatter_pallas import scatter_block_for
    blk = scatter_block_for(g0.num_nodes, cfg.nhid, itemsize=2)
    if backend != "tpu":
        scatter_s = f"off (backend={backend})"
    elif cfg.dtype != "bfloat16":
        scatter_s = "off (dtype=float32: XLA scatter keeps f32 rows; " \
                    "--dtype bfloat16 engages the MXU kernel)"
    elif blk is not None:
        scatter_s = f"on (block={blk})"
    else:
        scatter_s = f"off (N={g0.num_nodes} x F={cfg.nhid} working set " \
                    f"exceeds the VMEM budget even at block=256)"
    log_fn(f"[fastpath] scatter_mxu_kernel={scatter_s}")
    # fused sampled-edge score head (ops/score_sampled.py): serves every
    # score_from call with unsorted indices (receiver_band == 0) — the
    # hybrid fast path's gradient head and the non-tile sampling pass
    from ..ops.score_sampled import fused_head_block
    fused_blk = fused_head_block(g0.num_nodes, cfg.nhid, cfg.nhid)
    if cfg.mode != "learned":
        fused_s = "off (learned mode only)"
    elif backend != "tpu":
        fused_s = f"off (backend={backend})"
    elif cfg.nhid % 128 != 0:
        fused_s = f"off (nhid={cfg.nhid} not a multiple of 128: head " \
                  f"widths must be MXU-aligned)"
    elif fused_blk is not None:
        fused_s = f"on (N={g0.num_nodes}, block={fused_blk}: " \
                  f"gather+head+scatter fused, h VMEM-resident)"
    else:
        fused_s = f"off (N={g0.num_nodes} x F={cfg.nhid} one-hot working " \
                  f"set exceeds the VMEM budget at every block size)"
    log_fn(f"[fastpath] fused_sampled_head={fused_s}")
    # r5 sorted-head band (ops/score_sampled.py): sampled indices sorted on
    # device so the fused head's near-sorted side runs banded one-hot ops
    if cfg.sorted_head == "off":
        sort_s = "off (--sorted_head off)"
    elif fused_blk is None or "on" not in fused_s:
        sort_s = "off (fused head not engaged)"
    else:
        from ..ops.score_sampled import DEFAULT_HEAD_BAND
        side = "senders (tile order)" if g0.tile_t else "receivers"
        sort_s = (f"on (band={DEFAULT_HEAD_BAND}, sorted side={side}, "
                  f"full-kernel fallback on wide-span steps)")
    log_fn(f"[fastpath] sorted_head={sort_s}")
    # sampling top-k reduction (ops/sampling_ops._select_topk)
    if not cfg.approx_topk:
        topk_s = "exact (lax.top_k; --approx_topk engages approx_max_k)"
    else:
        if not cfg.topk_bf16:
            why = "off (--topk_bf16 off)"
        elif backend != "tpu":
            why = f"off (backend={backend})"
        elif os.environ.get("SGS_TOPK_BF16", "on") == "off":
            why = "off (SGS_TOPK_BF16=off)"
        else:
            why = "on"
        topk_s = f"approx (recall~0.97, bf16_keys={why})"
    log_fn(f"[fastpath] sampling_topk={topk_s}")


def _valid_edges(g: Graph) -> int:
    return int(np.asarray(jnp.sum(g.edge_mask)))


def run_experiment(cfg: Config, ds: Optional[HostDataset] = None,
                   log_fn=print) -> List[RunResult]:
    cfg.validate()
    if cfg.multihost:
        # must precede the first JAX computation; after this jax.devices()
        # spans every host (parallel/distributed.py)
        from ..parallel.distributed import init_distributed, is_primary
        init_distributed(cfg.coordinator_address, cfg.num_processes,
                         cfg.process_id)
        if not is_primary():
            # secondary hosts compute everything but stay silent; the
            # primary owns stdout/CSV/checkpoints
            log_fn = lambda *a, **k: None  # noqa: E731
            cfg = cfg.replace(save_csv=False, plot_curve=False)
    if ds is None:
        ds = get_dataset(cfg)
    if cfg.halo:
        return run_experiment_halo(cfg, ds, log_fn)
    if cfg.data_parallel == "on":
        return run_experiment_parallel(cfg, ds, log_fn)
    batches, q = prepare_batches(cfg, ds)
    if cfg.debug_checks:
        from ..utils.debug import validate_graph
        for i, b in enumerate(batches):
            validate_graph(b, name=f"batch{i}")
    n_batches = len(batches)
    valid_e = [_valid_edges(g) for g in batches]
    has_train = [bool(np.asarray(g.train_mask).any()) for g in batches]
    if cfg.log:
        log_fn(f"dataset={ds.name} N={ds.num_nodes} E={ds.num_edges} "
               f"He={ds.He:.4f} parts={n_batches} q={q}")
        log_fastpath_status(cfg, batches, q, log_fn)

    model = get_model(cfg.GNN, batches[0].x.shape[1], cfg.nhid,
                      ds.num_classes, cfg.drop_rate, cfg.edge_mlp_type,
                      heads=cfg.gat_heads, dtype=cfg.dtype)
    results: List[RunResult] = []

    # whole-epoch device-side scan (train/pipelines.make_scan_epoch_step):
    # ONE dispatch per epoch instead of one per cluster batch — at 100+
    # batches the per-call dispatch latency dominates the epoch (measured
    # ~2.7 s of a 7.9 s Reddit-scale epoch). The per-batch big/small/skip
    # decision becomes a lax.switch on a static action table.
    # all modes ride the scan (learned: pipeline loss + gated dual-Adam;
    # random/edge/full: baseline loss + the third Adam) so baseline-mode
    # comparisons at 100+ partitions are not unfairly dispatch-bound
    use_scan = cfg.scan_epoch != "off" and n_batches > 1
    # padded shape classes (data/partition.py shape_class_targets): batches
    # padded to the same edge shape stack (and scan) together; each class
    # compiles its own executable. With shape_classes=1 this is one class.
    shape_of = [int(np.asarray(b.senders).shape[0]) for b in batches]
    class_shapes = sorted(set(shape_of), reverse=True)
    class_members = [[i for i in range(n_batches) if shape_of[i] == cs]
                     for cs in class_shapes]
    scans = None
    # first batch WITH train nodes: the [gpu-profile] segments time a real
    # backward on both execution paths (a train-node-free batch would
    # profile an empty-mask loss)
    profile_bi = next((i for i in range(n_batches) if has_train[i]), 0)
    if use_scan:
        from ..parallel.partitioned import stack_batches
        from ..train.pipelines import make_scan_epoch_step
        from ..eval.evaluate import make_scan_eval_step
        # 0 = skip (no train nodes), 1 = small (valid <= q), 2 = sampled
        scans = []
        for mem in class_members:
            scans.append(dict(
                stacked=stack_batches([batches[i] for i in mem]),
                actions=jnp.asarray(
                    [0 if not has_train[i] else (2 if valid_e[i] > q else 1)
                     for i in mem], jnp.int32),
                eval_small=jnp.asarray(
                    [1 if valid_e[i] <= q else 0 for i in mem], jnp.int32),
                gids=jnp.asarray(mem, jnp.int32)))
        n_trained = int(sum(1 for i in range(n_batches) if has_train[i]))
        g_keep = batches[profile_bi]
        # free the per-batch device arrays: the stacked copies are the only
        # consumers from here on (halves peak device memory)
        batches = None
        if cfg.log:
            log_fn(f"[fastpath] scan_epoch=on ({n_batches} batches/"
                   f"{len(scans)} dispatches, {n_trained} trained, "
                   f"shape_classes={[len(m) for m in class_members]} "
                   f"x edges={class_shapes})")

    # 'rbg' is the fast TPU-native PRNG; threefry (default) is slower but
    # bitwise-stable across backends — tests use threefry, big runs rbg
    root_key = jax.random.key(cfg.seed, impl=cfg.prng_impl)

    for run in range(cfg.runs):
        run_key = jax.random.fold_in(root_key, run + 1)
        g0 = g_keep if use_scan else batches[0]
        # parameter init always uses threefry: rbg keys have duplicated
        # 64-bit halves and fold_in chains can produce structured draws that
        # poison training (observed: anti-predictive models). rbg is only
        # for per-step noise (dropout masks, gumbel sampling), where speed
        # matters and stream quality is uncritical.
        params = init_params(model, jax.random.PRNGKey(cfg.seed * 1000 + run),
                             g0.x, g0.senders, g0.receivers)
        opt = DualOptimizer.create(params, cfg.GNN, cfg.lr, cfg.weight_decay)
        opt_state = opt.init(params)
        if use_scan:
            epoch_step = make_scan_epoch_step(cfg, model, opt, q,
                                              cfg.epochs, n_batches)
            ev_scan = make_scan_eval_step(cfg, model, q)
        else:
            step_big = make_train_step(cfg, model, opt, q, cfg.epochs)
            step_small = make_train_step(cfg, model, opt, q, cfg.epochs,
                                         force_small=True)
            ev_big = make_eval_step(cfg, model, q)
            ev_small = make_eval_step(cfg, model, q, force_small=True)
        seg_profile = None
        if cfg.gpu_profile:
            from ..utils.profiler import make_segment_profiler
            seg_profile = make_segment_profiler(cfg, model, q)

        res = RunResult()
        best_params_bytes = None
        best_temp = 0.0
        epoch_times: List[float] = []
        shuffle_rng = np.random.default_rng(cfg.seed + run)
        num_iteration = cfg.epochs
        start_epoch = 0

        from flax import serialization
        from .checkpoint import TrainState, save_checkpoint, load_checkpoint

        ckpt_path = os.path.join(
            cfg.results_dir, "ckpt",
            f"{cfg.dataset}_{cfg.mode}_{cfg.pipeline}_run{run}.pkl")
        if cfg.resume:
            st = load_checkpoint(ckpt_path, params, opt_state)
            if st is not None:
                params, opt_state = st.params, st.opt_state
                start_epoch = st.epoch + 1
                res.best_val_f1 = st.best_val_f1
                res.test_at_best_val = st.test_at_best_val
                best_temp = st.best_temperature
                res.losses = list(st.losses)
                # pre-r5 checkpoints lack the best-val snapshot; fall back
                # to the restored last-checkpoint params
                best_params_bytes = (st.best_params_bytes
                                     or serialization.to_bytes(params))
                if cfg.log:
                    log_fn(f"resumed run {run} from epoch {start_epoch} "
                           f"(best_val_f1={st.best_val_f1:.4f})")

        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.time()
            # class-major shuffle: shuffle the class visit sequence, then
            # each class's batches — IDENTICAL on the scan and loop paths,
            # and with one shape class it degenerates to the plain global
            # shuffle of before. Per-batch PRNG keys depend only on the
            # GLOBAL batch id, so classing never changes a batch's noise.
            if len(class_members) > 1:
                class_seq = [int(c) for c in
                             shuffle_rng.permutation(len(class_members))]
            else:
                class_seq = [0]
            local_orders = {ci: shuffle_rng.permutation(
                len(class_members[ci])) for ci in class_seq}
            # accumulate loss/metrics ON DEVICE; one host readback per epoch
            # (the reference blocks on loss.item() every batch,
            # training_hybrid.py:186 — at Reddit scale that is 115 blocking
            # device->host syncs per epoch)
            if use_scan:
                # one dispatch per shape class per epoch; identical
                # per-batch keys/order/updates as the loop below (parity:
                # tests/test_train.py::test_scan_epoch_matches_batch_loop)
                res.total_updates += n_trained
                loss_acc = jnp.zeros(())
                cond_acc = jnp.zeros(())
                temp_dev = jnp.ones(())
                for ci in class_seq:
                    sc = scans[ci]
                    params, opt_state, (l_acc, c_acc, temp_dev) = \
                        epoch_step(params, opt_state, sc["stacked"],
                                   jnp.asarray(local_orders[ci].astype(
                                       np.int32)),
                                   sc["actions"], sc["gids"],
                                   jnp.asarray(epoch), run_key)
                    loss_acc = loss_acc + l_acc
                    cond_acc = cond_acc + c_acc
            else:
                order = [class_members[ci][j] for ci in class_seq
                         for j in local_orders[ci]]
                loss_acc = jnp.zeros(())
                cond_acc = jnp.zeros(())
                temp_dev = jnp.ones(())
                for bi in order:
                    if not has_train[bi]:
                        continue
                    res.total_updates += 1
                    step = step_big if valid_e[bi] > q else step_small
                    params, opt_state, m = step(
                        params, opt_state, batches[bi], jnp.asarray(epoch),
                        jax.random.fold_in(run_key,
                                           epoch * n_batches + int(bi) + 1))
                    loss_acc = loss_acc + m.loss
                    cond_acc = cond_acc + m.conditional_update
                    temp_dev = m.temperature
            # reference divides by len(cluster_loader) incl. skipped batches
            loss = float(loss_acc) / n_batches   # epoch's one sync point
            temp = float(temp_dev)
            res.conditional_updates += int(cond_acc)
            res.losses.append(loss)
            epoch_times.append(time.time() - t0)
            if cfg.stats and cfg.log and epoch < 16:
                # first epochs separate compile time from steady state
                log_fn(f"[epoch-time] epoch={epoch} "
                       f"sec={epoch_times[-1]:.3f}")

            if seg_profile is not None:
                # per-epoch [gpu-profile] line with the reference's four
                # segment names (reference main.py:171-207), each timed
                # stand-alone (utils/profiler.make_segment_profiler), plus
                # PJRT allocator stats in place of CUDA memory counters
                from ..utils.profiler import device_memory_mb
                profile_g = g_keep if use_scan else batches[profile_bi]
                segs, seg_mb = seg_profile(
                    params, profile_g,
                    jax.random.fold_in(run_key, 2**29 + epoch))
                mem = device_memory_mb()
                mem_s = (f"allocated_mb={mem.get('allocated_mb', 0):.1f} "
                         f"peak_mb={mem.get('peak_mb', 0):.1f}"
                         if mem else "mem=n/a")
                seg_s = " ".join(f"{k}_ms={v:.2f}" for k, v in segs.items())
                mb_s = " ".join(f"{k}_mb={v:.1f}" for k, v in seg_mb.items())
                log_fn(f"[gpu-profile] epoch={epoch} "
                       f"step_time_ms={epoch_times[-1]/max(n_batches,1)*1e3:.2f} "
                       f"batches={n_batches} {seg_s} {mb_s} {mem_s}")

            if cfg.eval:
                # device-side accumulation across partitions; ONE host
                # transfer per eval epoch inside aggregate_eval
                ek = jax.random.fold_in(run_key, 2**30 + epoch)
                if use_scan:
                    ev_acc = None
                    for sc in scans:
                        ev_acc = accumulate_eval_device(ev_acc, ev_scan(
                            params, sc["stacked"], sc["eval_small"], ek,
                            jnp.asarray(temp)))
                else:
                    ev_acc = None
                    for bi in range(n_batches):
                        ev = ev_big if valid_e[bi] > q else ev_small
                        ev_acc = accumulate_eval_device(ev_acc, ev(
                            params, batches[bi], ek, jnp.asarray(temp)))
                agg = aggregate_eval([ev_acc])
                tr_f1, va_f1, te_f1 = (agg["train_f1"], agg["val_f1"],
                                       agg["test_f1"])
                res.train_curve.append(tr_f1)
                res.val_curve.append(va_f1)
                res.test_curve.append(te_f1)
                if va_f1 >= res.best_val_f1:
                    res.best_val_f1 = va_f1
                    res.test_at_best_val = te_f1
                    best_params_bytes = serialization.to_bytes(params)
                    best_temp = temp
                    if cfg.log:
                        log_fn(f"*Epoch {epoch}, model saved with Loss: "
                               f"{loss:.4f}, Train F1: {tr_f1:.4f}, Val F1: "
                               f"{va_f1:.4f}, Test F1: {te_f1:.4f}")
                res.best_test_f1 = max(res.best_test_f1, te_f1)
                if cfg.log and epoch % 100 == 0:
                    log_fn(f"Epoch {epoch}, Loss: {loss:.4f}, Train F1: "
                           f"{tr_f1:.4f}, Val F1: {va_f1:.4f}, Test F1: "
                           f"{te_f1:.4f}")

            if cfg.checkpoint_every and (epoch + 1) % cfg.checkpoint_every == 0:
                save_checkpoint(ckpt_path, TrainState(
                    params=params, opt_state=opt_state, epoch=epoch,
                    best_val_f1=res.best_val_f1,
                    test_at_best_val=res.test_at_best_val,
                    best_temperature=best_temp, losses=res.losses,
                    best_params_bytes=best_params_bytes))

            if epoch >= 5 and float(np.std(res.losses[-5:])) < cfg.convergence:
                num_iteration = epoch + 1
                break

        res.num_iterations = num_iteration
        res.train_time_sec = float(np.sum(epoch_times))
        res.mean_epoch_time = float(np.mean(epoch_times)) if epoch_times else 0.0

        # reload best params for the final ensemble eval (main.py:264-270)
        if best_params_bytes is not None:
            params = serialization.from_bytes(params, best_params_bytes)
        fk = jax.random.fold_in(run_key, 2**31 - 1)
        if use_scan:
            ev_acc = None
            for sc in scans:
                ev_acc = accumulate_eval_device(ev_acc, ev_scan(
                    params, sc["stacked"], sc["eval_small"], fk,
                    jnp.asarray(best_temp)))
        else:
            ev_acc = None
            for bi in range(n_batches):
                ev = ev_big if valid_e[bi] > q else ev_small
                ev_acc = accumulate_eval_device(ev_acc, ev(
                    params, batches[bi], fk, jnp.asarray(best_temp)))
        agg = aggregate_eval([ev_acc])
        res.final_train_f1 = agg["train_f1"]
        res.final_val_f1 = agg["val_f1"]
        res.final_test_f1 = agg["test_f1"]

        log_fn(f"Run: {run}")
        log_fn(f"Mean epoch time of run {res.mean_epoch_time:.4f}")
        log_fn(f"Iteration:  {res.num_iterations}")
        log_fn(f"EdgeMLP updated {res.conditional_updates}/{res.total_updates}")
        log_fn(f"Best Test F1 throughout: {res.best_test_f1:.4f}")
        log_fn(f"Best Test F1 after loading saved model: "
               f"{res.final_test_f1:.4f}")
        if cfg.stats:
            mem = _device_peak_mem_mb()
            mem_s = f"{mem:.2f}" if mem is not None else "NA"
            # edges/s = valid (unpadded) edges trained per second — the
            # north-star throughput metric, on both execution paths.
            # steady = median epoch: excludes the compile-dominated first
            # epoch (and one-off tunnel stalls) that the mean absorbs
            edges_per_s = sum(valid_e) / max(res.mean_epoch_time, 1e-9)
            steady = (sum(valid_e) / max(float(np.median(epoch_times)), 1e-9)
                      if epoch_times else 0.0)
            log_fn(f"[stats] pipeline={cfg.pipeline} run={run} "
                   f"train_time_sec={res.train_time_sec:.4f} "
                   f"edges_per_s={edges_per_s:.0f} "
                   f"edges_per_s_steady={steady:.0f} "
                   f"peak_device_mem_mb={mem_s} "
                   f"best_val_f1={res.final_val_f1:.4f} "
                   f"best_test_f1={res.final_test_f1:.4f}")
        if cfg.plot_curve and res.train_curve:
            from ..viz import plot_learning_curves
            os.makedirs(cfg.results_dir, exist_ok=True)
            plot_learning_curves(
                run, res.train_curve, res.val_curve, res.test_curve,
                path=os.path.join(cfg.results_dir,
                                  f"curves_{ds.name}_{cfg.mode}_run{run}.png"))
        if cfg.save_csv:
            _append_csv(cfg, ds, run, res)
        results.append(res)

    _summary(cfg, results, log_fn)
    return results


def _device_peak_mem_mb() -> Optional[float]:
    try:
        dev = jax.devices()[0]
        stats = dev.memory_stats()
        if stats and "peak_bytes_in_use" in stats:
            return stats["peak_bytes_in_use"] / (1024 ** 2)
    except Exception:
        pass
    return None


def _append_csv(cfg: Config, ds: HostDataset, run: int, res: RunResult):
    """Results/<dataset>/<sample_perc>.csv append (main.py:295-306)."""
    d = os.path.join(cfg.results_dir, ds.name)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"{cfg.sample_perc}.csv")
    exists = os.path.exists(path)
    with open(path, "a", newline="") as f:
        w = csv.writer(f)
        if not exists:
            w.writerow(["run", "iter", "he", "mode", "loss", "train_f1",
                        "val_f1", "test_f1"])
        w.writerow([run, res.num_iterations, ds.He, cfg.mode,
                    res.losses[-1] if res.losses else 0.0,
                    res.final_train_f1, res.final_val_f1, res.final_test_f1])


def _summary(cfg: Config, results: List[RunResult], log_fn):
    log_fn("---------------Stats-----------")
    log_fn(f"Mean training epoch runtime: "
           f"{np.mean([r.mean_epoch_time for r in results]):.4f}")
    its = [r.num_iterations for r in results]
    log_fn(f"Mean convergence number: {np.mean(its):.4f} +/- "
           f"{np.std(its):.4f}, {its}")
    if cfg.mode == "learned":
        log_fn(f"EdgeMLP updated/Total GNN updates "
               f"{np.round(np.mean([r.conditional_updates for r in results]))}"
               f"/{np.round(np.mean([r.total_updates for r in results]))}")
    bt = [r.best_test_f1 for r in results]
    tv = [r.test_at_best_val for r in results]
    ft = [r.final_test_f1 for r in results]
    log_fn(f"Mean Std of Best Test we could do F1 Score: {np.mean(bt):.4f} "
           f"+/- {np.std(bt):.4f}")
    log_fn(f"Mean Std of Test at best Val F1 Score: {np.mean(tv):.4f} +/- "
           f"{np.std(tv):.4f}")
    log_fn(f"Mean Std of Loaded best Val model Test F1 Score: "
           f"{np.mean(ft):.4f} +/- {np.std(ft):.4f}")
    log_fn("-------------------------------")


def run_experiment_parallel(cfg: Config, ds: HostDataset,
                            log_fn=print) -> List[RunResult]:
    """Partition-parallel experiment: cluster batches shard over the device
    mesh, one synchronized grad-psum update per epoch super-step
    (parallel/partitioned.py). The superset scaling mode — N sequential
    reference steps become one data-parallel step; quality tracking, eval,
    best-val selection, and reporting mirror run_experiment.

    Requires the number of partitions to be a multiple of the device count
    (each device holds one or more partitions per super-step)."""
    from flax import serialization
    from ..parallel import (make_mesh, stack_batches, device_count,
                            make_parallel_train_step, make_parallel_eval_step)

    n_dev = device_count()
    cfg_p = cfg if cfg.num_partitions else cfg.replace(num_partitions=max(
        n_dev, int(np.ceil(ds.num_edges / cfg.metis_threshold))))
    # round partitions up to a device multiple
    parts = int(np.ceil(cfg_p.num_partitions / n_dev) * n_dev)
    cfg_p = cfg_p.replace(num_partitions=parts)
    batches, q = prepare_batches(cfg_p, ds)
    if len(batches) == 1:
        raise ValueError("data_parallel=on needs a partitioned graph; lower "
                         "--metis_threshold or set --num_partitions")
    assert len(batches) % n_dev == 0, (
        f"{len(batches)} partition batches do not tile {n_dev} devices — "
        f"prepare_batches must not compact partitions under data_parallel")
    # q is threshold*perc (reference main.py:50) but the stacked step samples
    # from the padded per-partition edge array — clamp so top_k(k=q) is
    # always valid. Shards whose VALID edge count is <= q sample every real
    # edge (padding is masked out of weights/regs in make_learned_loss); the
    # reference's dynamic small-batch branch (training_hybrid.py:142-147)
    # is a per-batch host decision this uniform step intentionally subsumes.
    q = min(q, batches[0].num_edges)
    if cfg.debug_checks:
        from ..utils.debug import validate_graph
        for i, b in enumerate(batches):
            validate_graph(b, name=f"batch{i}")
    mesh = make_mesh(n_dev)
    if cfg.multihost and jax.process_count() > 1:
        # each host materializes on device ONLY the partitions in its own
        # mesh slots; the global stacked batch is assembled shard-by-shard
        # (parallel/distributed.py, no cross-host data motion)
        from ..parallel.distributed import (local_slot_indices,
                                            stack_local_to_global)
        slots = local_slot_indices(mesh)
        groups = [stack_local_to_global([batches[i + s] for s in slots],
                                        mesh)
                  for i in range(0, len(batches), n_dev)]
    else:
        groups = [stack_batches(batches[i:i + n_dev])
                  for i in range(0, len(batches), n_dev)]
    if cfg.log:
        log_fn(f"dataset={ds.name} parts={len(batches)} devices={n_dev} "
               f"hosts={jax.process_count()} "
               f"super_steps/epoch={len(groups)} q={q}")
        log_fastpath_status(cfg, batches, q, log_fn)

    model = get_model(cfg.GNN, batches[0].x.shape[1], cfg.nhid,
                      ds.num_classes, cfg.drop_rate, cfg.edge_mlp_type,
                      heads=cfg.gat_heads, dtype=cfg.dtype)
    results: List[RunResult] = []
    root_key = jax.random.key(cfg.seed, impl=cfg.prng_impl)

    for run in range(cfg.runs):
        run_key = jax.random.fold_in(root_key, run + 1)
        g0 = batches[0]
        params = init_params(model, jax.random.PRNGKey(cfg.seed * 1000 + run),
                             g0.x, g0.senders, g0.receivers)
        opt = DualOptimizer.create(params, cfg.GNN, cfg.lr, cfg.weight_decay)
        opt_state = opt.init(params)
        step = make_parallel_train_step(cfg, model, opt, q, cfg.epochs, mesh)
        ev = make_parallel_eval_step(cfg, model, q, mesh)
        seg_profile = None
        if cfg.gpu_profile:
            # per-segment profile of ONE partition's loss — the per-shard
            # work of the sharded step (utils/profiler.make_segment_profiler)
            from ..utils.profiler import make_segment_profiler
            seg_profile = make_segment_profiler(cfg, model, q)

        res = RunResult()
        best_params_bytes = None
        best_temp = 0.0
        epoch_times: List[float] = []
        num_iteration = cfg.epochs
        start_epoch = 0

        from .checkpoint import TrainState, save_checkpoint, load_checkpoint
        ckpt_path = os.path.join(
            cfg.results_dir, "ckpt",
            f"{cfg.dataset}_{cfg.mode}_{cfg.pipeline}_par_run{run}.pkl")
        if cfg.resume:
            st = load_checkpoint(ckpt_path, params, opt_state)
            if st is not None:
                params, opt_state = st.params, st.opt_state
                start_epoch = st.epoch + 1
                res.best_val_f1 = st.best_val_f1
                res.test_at_best_val = st.test_at_best_val
                best_temp = st.best_temperature
                res.losses = list(st.losses)
                # pre-r5 checkpoints lack the best-val snapshot; fall back
                # to the restored last-checkpoint params
                best_params_bytes = (st.best_params_bytes
                                     or serialization.to_bytes(params))
                if cfg.log:
                    log_fn(f"resumed run {run} from epoch {start_epoch} "
                           f"(best_val_f1={st.best_val_f1:.4f})")

        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.time()
            # device-side accumulation; single host readback per epoch
            loss_acc = jnp.zeros(())
            cond_acc = jnp.zeros(())
            temp_dev = jnp.ones(())
            for gi, gstack in enumerate(groups):
                res.total_updates += n_dev
                params, opt_state, m = step(
                    params, opt_state, gstack, jnp.asarray(epoch),
                    jax.random.fold_in(run_key,
                                       epoch * len(groups) + gi + 1))
                loss_acc = loss_acc + m.loss
                cond_acc = cond_acc + m.conditional_update
                temp_dev = m.temperature
            loss = float(loss_acc) / len(groups)
            temp = float(temp_dev)
            res.conditional_updates += int(cond_acc)
            res.losses.append(loss)
            epoch_times.append(time.time() - t0)

            if seg_profile is not None:
                from ..utils.profiler import device_memory_mb
                segs, seg_mb = seg_profile(
                    params, batches[0],
                    jax.random.fold_in(run_key, 2**29 + epoch))
                mem = device_memory_mb()
                mem_s = (f"allocated_mb={mem.get('allocated_mb', 0):.1f} "
                         f"peak_mb={mem.get('peak_mb', 0):.1f}"
                         if mem else "mem=n/a")
                seg_s = " ".join(f"{k}_ms={v:.2f}" for k, v in segs.items())
                mb_s = " ".join(f"{k}_mb={v:.1f}" for k, v in seg_mb.items())
                log_fn(f"[gpu-profile] epoch={epoch} "
                       f"super_step_time_ms="
                       f"{epoch_times[-1]/max(len(groups),1)*1e3:.2f} "
                       f"super_steps={len(groups)} {seg_s} {mb_s} {mem_s}")

            if cfg.eval:
                ev_acc = None
                for gstack in groups:
                    ev_acc = accumulate_eval_device(ev_acc, ev(
                        params, gstack,
                        jax.random.fold_in(run_key, 2**30 + epoch),
                        jnp.asarray(temp)))
                agg = aggregate_eval([ev_acc])
                res.train_curve.append(agg["train_f1"])
                res.val_curve.append(agg["val_f1"])
                res.test_curve.append(agg["test_f1"])
                if agg["val_f1"] >= res.best_val_f1:
                    res.best_val_f1 = agg["val_f1"]
                    res.test_at_best_val = agg["test_f1"]
                    best_params_bytes = serialization.to_bytes(params)
                    best_temp = temp
                res.best_test_f1 = max(res.best_test_f1, agg["test_f1"])

            if cfg.checkpoint_every and (epoch + 1) % cfg.checkpoint_every == 0:
                save_checkpoint(ckpt_path, TrainState(
                    params=params, opt_state=opt_state, epoch=epoch,
                    best_val_f1=res.best_val_f1,
                    test_at_best_val=res.test_at_best_val,
                    best_temperature=best_temp, losses=res.losses,
                    best_params_bytes=best_params_bytes))

            if epoch >= 5 and float(np.std(res.losses[-5:])) < cfg.convergence:
                num_iteration = epoch + 1
                break

        res.num_iterations = num_iteration
        res.train_time_sec = float(np.sum(epoch_times))
        res.mean_epoch_time = float(np.mean(epoch_times)) if epoch_times else 0.0
        if best_params_bytes is not None:
            params = serialization.from_bytes(params, best_params_bytes)
        ev_acc = None
        for gstack in groups:
            ev_acc = accumulate_eval_device(ev_acc, ev(
                params, gstack, jax.random.fold_in(run_key, 2**31 - 1),
                jnp.asarray(best_temp)))
        agg = aggregate_eval([ev_acc])
        res.final_train_f1 = agg["train_f1"]
        res.final_val_f1 = agg["val_f1"]
        res.final_test_f1 = agg["test_f1"]
        log_fn(f"Run: {run} (data-parallel x{n_dev})")
        log_fn(f"Mean epoch time of run {res.mean_epoch_time:.4f}")
        log_fn(f"Iteration:  {res.num_iterations}")
        log_fn(f"EdgeMLP updated {res.conditional_updates}/{res.total_updates}")
        log_fn(f"Best Test F1 throughout: {res.best_test_f1:.4f}")
        log_fn(f"Best Test F1 after loading saved model: "
               f"{res.final_test_f1:.4f}")
        if cfg.stats:
            mem = _device_peak_mem_mb()
            mem_s = f"{mem:.2f}" if mem is not None else "NA"
            tot_valid = sum(int(np.asarray(b.edge_mask).sum())
                            for b in batches)
            edges_per_s = tot_valid / max(res.mean_epoch_time, 1e-9)
            steady = (tot_valid / max(float(np.median(epoch_times)), 1e-9)
                      if epoch_times else 0.0)
            log_fn(f"[stats] pipeline={cfg.pipeline} run={run} parallel={n_dev} "
                   f"train_time_sec={res.train_time_sec:.4f} "
                   f"edges_per_s={edges_per_s:.0f} "
                   f"edges_per_s_steady={steady:.0f} "
                   f"peak_device_mem_mb={mem_s} "
                   f"best_val_f1={res.final_val_f1:.4f} "
                   f"best_test_f1={res.final_test_f1:.4f}")
        if cfg.save_csv:
            _append_csv(cfg, ds, run, res)
        results.append(res)

    _summary(cfg, results, log_fn)
    return results


def run_experiment_halo(cfg: Config, ds: HostDataset,
                        log_fn=print) -> List[RunResult]:
    """Halo-exchange experiment (`--halo`): every device owns a node shard
    plus ALL its inbound edges; per-layer halo exchanges make partitioned
    execution compute FULL-GRAPH semantics (parallel/halo_train.py) — the
    superset of the reference's drop-inter-cluster-edges batching
    (reference main.py:63). One synchronized step per epoch; reporting,
    best-val selection, and the stats/CSV surface mirror run_experiment."""
    from flax import serialization
    from ..parallel import (make_mesh, device_count, build_halo_batch,
                            shard_halo_batch, make_halo_train_step,
                            make_halo_eval_step)

    n_dev = device_count()
    mesh = make_mesh(n_dev)
    hb = build_halo_batch(ds.x, ds.edge_index, ds.y, ds.train_mask,
                          ds.val_mask, ds.test_mask, ds.prob, n_dev,
                          ds.num_classes, sample_perc=cfg.sample_perc)
    valid_edges = hb.valid_edges
    hb = shard_halo_batch(hb, mesh)
    if cfg.log:
        log_fn(f"dataset={ds.name} N={ds.num_nodes} E={ds.num_edges} "
               f"halo devices={n_dev} q_loc={hb.q_loc}")
        saved = 1.0 - hb.ext_rows / max(hb.gather_rows, 1)
        log_fn(f"[fastpath] halo_exchange=ppermute "
               f"rows_per_exchange={hb.ext_rows} "
               f"vs_all_gather={hb.gather_rows} "
               f"({100 * saved:.1f}% traffic saved; "
               f"rounds={[r for r in hb.round_sizes]})")

    model = get_model(cfg.GNN, ds.x.shape[1], cfg.nhid, ds.num_classes,
                      cfg.drop_rate, cfg.edge_mlp_type,
                      heads=cfg.gat_heads, dtype=cfg.dtype)
    results: List[RunResult] = []
    root_key = jax.random.key(cfg.seed, impl=cfg.prng_impl)
    # init on a bounded slice: param shapes depend only on feature/class dims
    n_init = min(ds.num_nodes, 2048)
    e_init = np.minimum(
        np.asarray(ds.edge_index[:, :min(ds.num_edges, 4096)]), n_init - 1)

    seg_profile = None
    profile_g = None
    if cfg.gpu_profile:
        # halo computes FULL-GRAPH semantics, so the segment profile runs
        # the whole-graph segments stand-alone (bounded: skip past 5M edges
        # where the unsharded stand-alone segments would not fit one chip)
        if ds.num_edges <= 5_000_000:
            from ..utils.profiler import make_segment_profiler
            q_total = hb.q_loc * n_dev
            seg_profile = make_segment_profiler(cfg, model, q_total)
            profile_g = Graph.build(ds.x, ds.edge_index, ds.y, ds.train_mask,
                                    ds.val_mask, ds.test_mask, prob=ds.prob,
                                    num_classes=ds.num_classes)
        else:
            log_fn(f"[gpu-profile] skipped: E={ds.num_edges} > 5M (whole-"
                   f"graph stand-alone segments exceed one chip)")

    for run in range(cfg.runs):
        run_key = jax.random.fold_in(root_key, run + 1)
        params = init_params(model, jax.random.PRNGKey(cfg.seed * 1000 + run),
                             jnp.asarray(ds.x[:n_init]),
                             jnp.asarray(e_init[0]), jnp.asarray(e_init[1]))
        opt = DualOptimizer.create(params, cfg.GNN, cfg.lr, cfg.weight_decay)
        opt_state = opt.init(params)
        step = make_halo_train_step(cfg, opt, cfg.epochs, mesh)
        ev = make_halo_eval_step(cfg, mesh)

        res = RunResult()
        best_params_bytes = None
        best_temp = 0.0
        epoch_times: List[float] = []
        num_iteration = cfg.epochs
        start_epoch = 0

        from .checkpoint import TrainState, save_checkpoint, load_checkpoint
        ckpt_path = os.path.join(
            cfg.results_dir, "ckpt",
            f"{cfg.dataset}_{cfg.mode}_{cfg.pipeline}_halo_run{run}.pkl")
        if cfg.resume:
            st = load_checkpoint(ckpt_path, params, opt_state)
            if st is not None:
                params, opt_state = st.params, st.opt_state
                start_epoch = st.epoch + 1
                res.best_val_f1 = st.best_val_f1
                res.test_at_best_val = st.test_at_best_val
                best_temp = st.best_temperature
                res.losses = list(st.losses)
                # pre-r5 checkpoints lack the best-val snapshot; fall back
                # to the restored last-checkpoint params
                best_params_bytes = (st.best_params_bytes
                                     or serialization.to_bytes(params))
                if cfg.log:
                    log_fn(f"resumed run {run} from epoch {start_epoch} "
                           f"(best_val_f1={st.best_val_f1:.4f})")

        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.time()
            res.total_updates += 1
            params, opt_state, m = step(
                params, opt_state, hb, jnp.asarray(epoch),
                jax.random.fold_in(run_key, epoch + 1))
            loss = float(m.loss)      # single sync point per epoch
            temp = float(m.temperature)
            res.conditional_updates += int(m.conditional_update)
            res.losses.append(loss)
            epoch_times.append(time.time() - t0)

            if seg_profile is not None:
                from ..utils.profiler import device_memory_mb
                segs, seg_mb = seg_profile(
                    params, profile_g,
                    jax.random.fold_in(run_key, 2**29 + epoch))
                mem = device_memory_mb()
                mem_s = (f"allocated_mb={mem.get('allocated_mb', 0):.1f} "
                         f"peak_mb={mem.get('peak_mb', 0):.1f}"
                         if mem else "mem=n/a")
                seg_s = " ".join(f"{k}_ms={v:.2f}" for k, v in segs.items())
                mb_s = " ".join(f"{k}_mb={v:.1f}" for k, v in seg_mb.items())
                log_fn(f"[gpu-profile] epoch={epoch} "
                       f"halo_step_time_ms={epoch_times[-1] * 1e3:.2f} "
                       f"{seg_s} {mb_s} {mem_s}")

            if cfg.eval:
                agg = aggregate_eval([ev(params, hb,
                                         jax.random.fold_in(run_key,
                                                            2**30 + epoch),
                                         jnp.asarray(temp))])
                res.train_curve.append(agg["train_f1"])
                res.val_curve.append(agg["val_f1"])
                res.test_curve.append(agg["test_f1"])
                if agg["val_f1"] >= res.best_val_f1:
                    res.best_val_f1 = agg["val_f1"]
                    res.test_at_best_val = agg["test_f1"]
                    best_params_bytes = serialization.to_bytes(params)
                    best_temp = temp
                res.best_test_f1 = max(res.best_test_f1, agg["test_f1"])

            if cfg.checkpoint_every and (epoch + 1) % cfg.checkpoint_every == 0:
                save_checkpoint(ckpt_path, TrainState(
                    params=params, opt_state=opt_state, epoch=epoch,
                    best_val_f1=res.best_val_f1,
                    test_at_best_val=res.test_at_best_val,
                    best_temperature=best_temp, losses=res.losses,
                    best_params_bytes=best_params_bytes))

            if epoch >= 5 and float(np.std(res.losses[-5:])) < cfg.convergence:
                num_iteration = epoch + 1
                break

        res.num_iterations = num_iteration
        res.train_time_sec = float(np.sum(epoch_times))
        res.mean_epoch_time = float(np.mean(epoch_times)) if epoch_times else 0.0
        if best_params_bytes is not None:
            params = serialization.from_bytes(params, best_params_bytes)
        agg = aggregate_eval([ev(params, hb,
                                 jax.random.fold_in(run_key, 2**31 - 1),
                                 jnp.asarray(best_temp))])
        res.final_train_f1 = agg["train_f1"]
        res.final_val_f1 = agg["val_f1"]
        res.final_test_f1 = agg["test_f1"]
        log_fn(f"Run: {run} (halo x{n_dev})")
        log_fn(f"Mean epoch time of run {res.mean_epoch_time:.4f}")
        log_fn(f"EdgeMLP updated {res.conditional_updates}/{res.total_updates}")
        log_fn(f"Best Test F1 after loading saved model: "
               f"{res.final_test_f1:.4f}")
        if cfg.stats:
            mem = _device_peak_mem_mb()
            mem_s = f"{mem:.2f}" if mem is not None else "NA"
            edges_per_s = valid_edges / max(res.mean_epoch_time, 1e-9)
            steady = (valid_edges / max(float(np.median(epoch_times)), 1e-9)
                      if epoch_times else 0.0)
            log_fn(f"[stats] pipeline={cfg.pipeline} run={run} halo={n_dev} "
                   f"train_time_sec={res.train_time_sec:.4f} "
                   f"edges_per_s={edges_per_s:.0f} "
                   f"edges_per_s_steady={steady:.0f} "
                   f"peak_device_mem_mb={mem_s} "
                   f"best_val_f1={res.final_val_f1:.4f} "
                   f"best_test_f1={res.final_test_f1:.4f}")
        if cfg.save_csv:
            _append_csv(cfg, ds, run, res)
        results.append(res)

    _summary(cfg, results, log_fn)
    return results
