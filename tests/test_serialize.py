"""utils.serialize: pytree pack/unpack round-trip, and the flagship
device-problem cache (drivers/square_circle.build_flagship_cache /
run_flagship_cached — VERDICT r3 next #1) at a tiny N."""
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from hybridsbp_tpu.utils.serialize import load_pytree, pack, save_pytree, unpack

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "drivers"))


def test_pack_unpack_roundtrip(tmp_path):
    from hybridsbp_tpu.tpu.multiblock import FaceOps

    obj = {
        "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
        "b": np.arange(4.0),
        "c": ("x", 3, None, 2.5),
        "faces": FaceOps(Tb=(jnp.ones((1, 2, 3)),),
                         offs=((0, 1),), layers=((0, 1),)),
        "lst": [1, jnp.zeros(2)],
    }
    out = unpack(pack(obj))
    assert isinstance(out["a"], jnp.ndarray)
    np.testing.assert_array_equal(np.asarray(out["a"]), np.asarray(obj["a"]))
    assert isinstance(out["b"], np.ndarray) and not isinstance(
        out["b"], jnp.ndarray)
    assert out["c"] == ("x", 3, None, 2.5)
    assert isinstance(out["faces"], FaceOps)
    assert out["faces"].offs == ((0, 1),)
    np.testing.assert_array_equal(np.asarray(out["faces"].Tb[0]),
                                  np.ones((1, 2, 3)))
    assert out["lst"][0] == 1

    p = tmp_path / "t.cache"
    save_pytree(str(p), obj, meta={"k": 1})
    out2, meta = load_pytree(str(p))
    assert meta == {"k": 1}
    np.testing.assert_array_equal(np.asarray(out2["a"]),
                                  np.asarray(obj["a"]))


@pytest.mark.skipif(not os.environ.get("HYBRIDSBP_SLOW_TESTS"),
                    reason="flagship-cache round trip ~90s (slow gate)")
def test_flagship_cache_roundtrip(tmp_path):
    """Build the flagship cache at N=17 and solve from it: both methods
    must converge and match the cached host f64 solution to the f32
    iterative floor; the fingerprint guard must reject a tampered
    cache."""
    import square_circle as sc

    p = str(tmp_path / "flagship.cache")
    sc.build_flagship_cache(path=p, p=6, N=17, verbose=False)
    res = sc.run_flagship_cached(path=p, repeats=1, flat=False,
                                 verbose=False)
    for m in ("displacements", "trace"):
        d = res[m]
        assert d["converged"], m
        assert d["rel_err"] < 5e-3, (m, d["rel_err"])

    # tampered fingerprint must be rejected
    from hybridsbp_tpu.utils.serialize import load_pytree, save_pytree
    payload, meta = load_pytree(p)
    meta["fingerprint"] = meta["fingerprint"] * 1.01
    save_pytree(p, payload, meta)
    with pytest.raises(RuntimeError, match="fingerprint"):
        sc.run_flagship_cached(path=p, repeats=1, verbose=False)
