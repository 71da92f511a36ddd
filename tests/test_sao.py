"""SAO encoder tests: device apply parity vs the NumPy oracle, and
end-to-end conformance (our decoder hash + PSNR effect)."""
import numpy as np
import pytest

from kvazaar_tpu.cfg import Config
from kvazaar_tpu.api import Encoder, encode_sequence
from kvazaar_tpu.decoder.decoder import HEVCDecoder


def _frames(w, h, n, seed=3):
    rng = np.random.default_rng(seed)
    for i in range(n):
        y = ((np.arange(w * h).reshape(h, w) * 3 + i * 7) % 256
             + rng.integers(0, 40, (h, w))).astype(np.uint8)
        cb = rng.integers(0, 256, (h // 2, w // 2)).astype(np.uint8)
        cr = ((np.arange(h // 2 * w // 2).reshape(h // 2, w // 2) + i)
              % 256).astype(np.uint8)
        yield y, cb, cr


def test_apply_parity_vs_oracle():
    """Device _apply must match ops.sao.apply_sao_plane for random
    params on a random plane (all types/classes/positions)."""
    import jax.numpy as jnp
    from kvazaar_tpu.ops.sao import apply_sao_plane
    from kvazaar_tpu.ops.sao_jax import _apply, _eo_cat_maps

    rng = np.random.default_rng(11)
    h, w, n = 48, 64, 16
    R, C = h // n, w // n
    rec = rng.integers(0, 256, (h, w)).astype(np.int32)
    typ = rng.integers(0, 3, (R, C)).astype(np.int32)
    cls = rng.integers(0, 4, (R, C)).astype(np.int32)
    pos = rng.integers(0, 29, (R, C)).astype(np.int32)
    offs = np.zeros((4, R, C), np.int32)
    offs[0] = rng.integers(0, 8, (R, C))
    offs[1] = rng.integers(0, 8, (R, C))
    offs[2] = -rng.integers(0, 8, (R, C))
    offs[3] = -rng.integers(0, 8, (R, C))
    boffs = rng.integers(-7, 8, (4, R, C)).astype(np.int32)
    offs = np.where(typ[None] == 1, boffs, offs)

    cats, valid = _eo_cat_maps(jnp.asarray(rec))
    out = np.asarray(_apply(jnp.asarray(rec), cats, valid,
                            jnp.asarray(typ), jnp.asarray(cls),
                            jnp.asarray(offs), jnp.asarray(pos), n))
    params = {}
    for r in range(R):
        for c in range(C):
            aux = int(pos[r, c]) if typ[r, c] == 1 else int(cls[r, c])
            params[(r, c)] = (int(typ[r, c]), list(offs[:, r, c]), aux)
    ref = apply_sao_plane(rec, params, n)
    assert np.array_equal(out, ref)


@pytest.mark.parametrize("kw", [
    dict(qp=30, intra_period=1),
    dict(qp=35, intra_period=0, ref_frames=2),
    dict(qp=30, intra_period=1, wpp=True),
    dict(qp=35, intra_period=4, wpp=True),
])
def test_sao_conformance(kw):
    w, h, n = 64, 48, 3
    cfg = Config(width=w, height=h, ctu_size=16, sao_type="full", **kw)
    bs, infos = encode_sequence(cfg, _frames(w, h, n))
    decoded = 0
    for f in HEVCDecoder().decode(bs):
        assert f.hash_ok, f"hash mismatch poc={f.poc}"
        decoded += 1
    assert decoded == n


def test_sao_improves_noisy_luma():
    w, h = 128, 96
    frame = next(_frames(w, h, 1))
    psnr = {}
    for sao in ("off", "full"):
        cfg = Config(width=w, height=h, ctu_size=16, qp=35,
                     intra_period=1, sao_type=sao)
        _, info = Encoder(cfg).encode_frame(*frame)
        psnr[sao] = info["psnr"][0]
    assert psnr["full"] > psnr["off"] + 0.05
