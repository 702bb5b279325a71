"""CheckpointIO unit tests — the multi-path save used at validation
boundaries (`LA_BCP_train.py:176-189` saves tagged + best; we add `last`
for resume).

`save_many` writes the tree once and hardlink-replicates the finished
orbax directory for the aliases; these tests pin the contract the
trainer relies on: every alias restores to the same values, an alias
survives its source being overwritten (fresh inodes per orbax save),
and repeated saves to the same alias path are clean overwrites.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bcp_tpu.train.checkpoints import CheckpointIO
from bcp_tpu.train.state import TrainState


def _tiny_state(seed: int) -> TrainState:
    k = jax.random.PRNGKey(seed)
    p = {"w": jax.random.normal(k, (4, 3)), "b": jnp.full((3,), float(seed))}
    return TrainState(
        step=jnp.int32(seed),
        params=p,
        batch_stats={"mean": jnp.ones((3,)) * seed},
        teacher_params=jax.tree_util.tree_map(lambda x: x + 1.0, p),
        teacher_batch_stats={"mean": jnp.zeros((3,))},
        opt_state=(jnp.float32(seed),),
    )


def _assert_state_equal(a: TrainState, b: TrainState):
    fa, _ = jax.tree_util.tree_flatten(a)
    fb, _ = jax.tree_util.tree_flatten(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_save_many_aliases_restore_identically(tmp_path):
    io = CheckpointIO()
    s = _tiny_state(3)
    paths = [str(tmp_path / n) for n in ("iter_200_dice_0.9", "best", "last")]
    io.save_many(paths, s)
    for p in paths:
        got = io.restore(p, _tiny_state(0))
        _assert_state_equal(got, s)


def test_alias_survives_source_overwrite(tmp_path):
    """Overwriting `last` (every validation does) must not corrupt the
    hardlinked `tagged`/`best` aliases from an earlier save_many."""
    io = CheckpointIO()
    s1, s2 = _tiny_state(1), _tiny_state(2)
    tagged, best, last = (str(tmp_path / n) for n in ("tag", "best", "last"))
    io.save_many([tagged, best, last], s1)
    io.save(last, s2)                      # non-best validation
    io.save_many([str(tmp_path / "tag2"), best, last], s2)  # new best
    _assert_state_equal(io.restore(tagged, _tiny_state(0)), s1)
    _assert_state_equal(io.restore(best, _tiny_state(0)), s2)
    _assert_state_equal(io.restore(last, _tiny_state(0)), s2)


def test_replicate_replaces_stale_target(tmp_path):
    """A replica target that already exists (e.g. `best` from a resumed
    run) is replaced wholesale, including files the new source lacks."""
    io = CheckpointIO()
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    io.save(src, _tiny_state(5))
    os.makedirs(dst, exist_ok=True)
    with open(os.path.join(dst, "stale_file"), "w") as f:
        f.write("old")
    CheckpointIO._replicate(src, dst)
    assert not os.path.exists(os.path.join(dst, "stale_file"))
    _assert_state_equal(io.restore(dst, _tiny_state(0)), _tiny_state(5))
