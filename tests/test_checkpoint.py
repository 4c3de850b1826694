"""Checkpoint/resume roundtrip (a capability the reference lacks)."""

import numpy as np
import jax
import jax.numpy as jnp

from isplib_tpu.train import (latest_step, restore_checkpoint,
                              save_checkpoint)


def test_roundtrip(tmp_path):
    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones((3,))}
    opt_state = {"mu": jnp.zeros((2, 3))}
    save_checkpoint(str(tmp_path / "ck"), 5, params, opt_state,
                    extra={"epoch": 5})
    assert latest_step(str(tmp_path / "ck")) == 5
    out = restore_checkpoint(str(tmp_path / "ck"))
    np.testing.assert_allclose(np.asarray(out["params"]["w"]),
                               np.arange(6.0).reshape(2, 3))
    assert out["extra"]["epoch"] == 5


def test_resume_overwrites(tmp_path):
    p1 = {"w": jnp.zeros((2,))}
    p2 = {"w": jnp.ones((2,))}
    save_checkpoint(str(tmp_path / "ck"), 1, p1)
    save_checkpoint(str(tmp_path / "ck"), 2, p2)
    out = restore_checkpoint(str(tmp_path / "ck"))
    np.testing.assert_allclose(np.asarray(out["params"]["w"]), 1.0)
