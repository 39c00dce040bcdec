"""Multi-epoch training driver: validation, early stopping, history.

The reference's training loop is one ``fit`` call per epoch driven by
hand (examples/fashion_mnist/fashion_mnist.nim:58-73: a Nim for-loop
echoing the loss).  This module is that loop as a library — epochs,
held-out validation, early stopping with best-parameter restore, and a
metrics history — over the existing ``Model.fit`` machinery
(scan-epoch compilation, shuffling, monitors all compose).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from .errors import ModelRuntimeError


def evaluate(model, target_name: str, args: dict, batch_size: int = 0
             ) -> float:
    """Mean of a scalar target over the dataset (no state updates).

    ``batch_size=0`` evaluates in one batch.  Refuses targets that
    mutate parameters/caches — evaluation must be side-effect-free.
    """
    if target_name not in model.program.targets:
        raise ModelRuntimeError(
            f"{target_name!r} is not a target of the model"
        )
    if model._target_mutates(target_name):
        raise ModelRuntimeError(
            f"target {target_name!r} updates model state; evaluate() "
            "is for pure metrics targets (loss, accuracy)"
        )
    n = next(iter(args.values())).shape[0]
    if not batch_size:
        batch_size = n
    total, count = 0.0, 0
    for start in range(0, n - batch_size + 1, batch_size):
        batch = {
            name: value[start:start + batch_size]
            for name, value in args.items()
        }
        out = model.call(target_name, batch)
        total += float(np.asarray(out).reshape(-1)[0])
        count += 1
    if count == 0:
        raise ModelRuntimeError(
            f"dataset smaller than batch_size ({n} < {batch_size})"
        )
    return total / count


def classification_accuracy(model, args: dict, labels: np.ndarray,
                            target_name: str = "predict",
                            batch_size: int = 0) -> float:
    """argmax-agreement between a prediction target's last axis and
    one-hot (or integer) ``labels``."""
    n = next(iter(args.values())).shape[0]
    if not batch_size:
        batch_size = n
    labels = np.asarray(labels)
    want = labels if labels.ndim == 1 else np.argmax(labels, axis=-1)
    hits, total = 0, 0
    for start in range(0, n - batch_size + 1, batch_size):
        batch = {
            name: value[start:start + batch_size]
            for name, value in args.items()
        }
        probs = np.asarray(model.call(target_name, batch))
        got = np.argmax(probs, axis=-1)
        w = want[start:start + batch_size]
        hits += int((got == w).sum())
        total += int(np.prod(np.shape(w)))
    return hits / max(total, 1)


def _mesh_epoch(model, executor, args, batch_size, shuffle, monitor):
    """One epoch through a ShardedExecutor; returns the monitor metric
    on the first batch (mirroring ``Model.fit``'s monitor contract)."""
    from .utils.native import gather_rows, shuffle_indices

    first = next(iter(args.values()))
    batch_count = first.shape[0] // batch_size
    order = None
    if shuffle:
        order = shuffle_indices(
            first.shape[0], int(model._rng.integers(0, 2**31 - 1))
        )
    model.epoch += 1
    for batch in range(batch_count):
        lo = batch * batch_size
        if order is None:
            batch_args = {
                name: np.asarray(value)[lo : lo + batch_size]
                for name, value in args.items()
            }
        else:
            idx = order[lo : lo + batch_size]
            batch_args = {
                name: gather_rows(np.asarray(value), idx)
                for name, value in args.items()
            }
        executor.run(batch_args)
    return evaluate(
        model, monitor,
        {name: np.asarray(value)[:batch_size]
         for name, value in args.items()},
    )


def train(
    model,
    target_name: str,
    args: dict,
    epochs: int,
    batch_size: int = 32,
    validation: Optional[dict] = None,
    monitor: str = "loss",
    patience: Optional[int] = None,
    min_delta: float = 0.0,
    restore_best: bool = True,
    shuffle: bool = True,
    scan_batches: bool = False,
    log: Optional[Callable[[str], None]] = None,
    checkpoint=None,
    checkpoint_every: int = 1,
    mesh=None,
    mesh_options: Optional[dict] = None,
    **fit_kw,
) -> list[dict]:
    """Train for up to ``epochs`` epochs; returns the metrics history.

    Each entry: ``{"epoch", "train_<monitor>", "val_<monitor>"?}``.
    ``validation`` holds held-out inputs for the ``monitor`` target
    (evaluated after every epoch); with ``patience`` set, training
    stops after that many epochs without a ``min_delta`` improvement
    of the validation metric, and ``restore_best=True`` puts the
    best-epoch parameters/optimizer state back on the model.

    ``checkpoint`` (an ``io.CheckpointManager``) saves the model every
    ``checkpoint_every`` epochs and once more at the end (rotating,
    resumable — restart training after ``checkpoint.restore()`` and the
    epoch counter continues where the checkpoint left off).

    ``mesh`` runs every training step through a
    ``parallel.ShardedExecutor`` over that device mesh (dp, and
    whatever ``mesh_options`` adds: ``model`` tp via the mesh shape,
    ``fsdp=True``, ``zero=True``, ``input_specs=...``) — validation,
    early stopping, best-restore, and checkpointing compose unchanged.
    ``scan_batches`` does not apply under a mesh.
    """
    if monitor not in model.program.targets:
        raise ModelRuntimeError(
            f"monitor target {monitor!r} is not a target of the model"
        )
    if patience is not None and patience < 1:
        raise ModelRuntimeError("patience must be >= 1")
    if patience is not None and validation is None:
        raise ModelRuntimeError(
            "early stopping (patience) requires a validation set"
        )
    mesh_exec = None
    if mesh is not None:
        if scan_batches:
            raise ModelRuntimeError(
                "scan_batches is not supported with mesh= (the sharded "
                "executor dispatches per batch)"
            )
        from .parallel.mesh import ShardedExecutor

        input_shapes = {
            name: [batch_size] + list(np.shape(value)[1:])
            for name, value in args.items()
        }
        mesh_exec = ShardedExecutor(
            model, target_name, input_shapes, mesh, **(mesh_options or {})
        )

    history: list[dict] = []
    best = (float("inf"), -1)  # (val metric, epoch index)
    best_state = None
    stale = 0
    for epoch in range(epochs):
        if mesh_exec is not None:
            train_metric = _mesh_epoch(
                model, mesh_exec, args, batch_size, shuffle, monitor
            )
        else:
            train_metric = model.fit(
                target_name, args, batch_size=batch_size, log_status=False,
                shuffle=shuffle, scan_batches=scan_batches, monitor=monitor,
                **fit_kw,
            )
        entry = {"epoch": model.epoch,
                 f"train_{monitor}": float(train_metric)}
        if validation is not None:
            val = evaluate(model, monitor, validation)
            entry[f"val_{monitor}"] = val
            if val < best[0] - min_delta:
                best = (val, epoch)
                stale = 0
                if restore_best:
                    best_state = (
                        {t: np.asarray(v).copy()
                         for t, v in model.params.items()},
                        {t: np.asarray(v).copy()
                         for t, v in model.caches.items()},
                        model.epoch,
                    )
            else:
                stale += 1
        history.append(entry)
        if log is not None:
            log(", ".join(f"{k}={v:.5g}" if isinstance(v, float) else
                          f"{k}={v}" for k, v in entry.items()))
        if checkpoint is not None and (epoch + 1) % checkpoint_every == 0:
            checkpoint.save(model)
        if patience is not None and stale >= patience:
            break
    if checkpoint is not None:
        checkpoint.save(model)
        checkpoint.wait()
    if restore_best and best_state is not None:
        params, caches, epoch_at = best_state
        model.params.update(params)
        model.caches.update(caches)
        model.epoch = epoch_at
    return history
