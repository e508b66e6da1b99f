#!/usr/bin/env python
"""On-chip parity gate for the Pallas/MXU fast paths.

The CPU test suite exercises every Pallas kernel in interpret mode
(tests/test_fused_convbn.py, test_pallas_fused_loss.py,
test_warp_table.py) — that pins the kernel *math*, but not the Mosaic
compilation on the real chip.  This script re-runs the same oracles ON
the TPU so a wrong-on-hardware kernel is caught before bench.py's A/B
timings (or a flipped production default) could launder it into the
round's numbers.

Checks (fast, small shapes, one JSON line out):
  warp_table    Pallas row-layout table vs the XLA roll construction
                (bit-exact contract, ops/pallas/warp_table.py:11-18)
  fused_loss    (pce, ent, sce) values + logits grads vs the jnp
                reference (ops/pallas/fused_loss.py)
  fused_convbn  forward + all five grads vs the unfused XLA twin
                (ops/pallas/fused_convbn.py), groups 1 and 4 (S2D)
  mxu_bn        matmul-statistics BN vs the reduce path value + grads
                (ops/fused_bn.py)

Exit 0 iff every check passes.  scripts/chip_queue_r4.sh runs this
before bench; a failure does not block the queue (bench's A/Bs carry
their own try/except) but lands in the round notes.
"""
import json
import os
import sys

# Invoked as `python scripts/chip_parity.py` the interpreter puts scripts/
# (not the repo root) on sys.path — bootstrap the package like
# scripts/gen_lvsc_data.py does.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = {}


def run_check(name, fn, tol):
    try:
        err = float(fn())
        RESULTS[name] = {"ok": err <= tol, "max_err": err, "tol": tol}
    except Exception as e:  # noqa: BLE001 — report, keep gating the rest
        RESULTS[name] = {"ok": False, "error": f"{type(e).__name__}: {e}"}


def main():
    from pacingpseudo_tpu.utils.chiplock import preflight_chip
    preflight_chip(owner_note="chip_parity.py",
                   wait_s=float(os.environ.get("CHIP_LOCK_WAIT", "900")))

    import jax
    import jax.numpy as jnp
    import numpy as np

    backend = jax.default_backend()
    rng = np.random.RandomState(0)

    # ---- warp table -------------------------------------------------------
    def check_warp():
        from pacingpseudo_tpu.ops.pallas.warp_table import (
            build_warp_table, build_warp_table_xla)
        img = jnp.asarray(rng.randn(256, 256).astype(np.float32))
        lab = jnp.asarray(rng.randint(0, 5, (256, 256)).astype(np.float32))
        scb = jnp.asarray(rng.randint(0, 6, (256, 256)).astype(np.float32))
        t_p = build_warp_table(img, lab, scb)
        t_x = jax.jit(build_warp_table_xla)(img, lab, scb)
        return jnp.max(jnp.abs(t_p - t_x))

    run_check("warp_table", check_warp, tol=0.0)

    # ---- fused pacing losses ----------------------------------------------
    def check_loss():
        from pacingpseudo_tpu.ops.pallas.fused_loss import (
            fused_losses_reference, fused_pacing_losses)
        n, h, w, c = 2, 64, 64, 5
        lw = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
        ls = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
        tgt = jnp.asarray(rng.randint(0, c + 1, (n, h, w)).astype(np.int32))
        msk = jnp.asarray((rng.rand(n, h, w) > 0.2).astype(np.float32))

        interp = backend == "cpu"  # interpret mode for the CPU smoke run

        def tot_f(lw, ls):
            a, b_, c_ = fused_pacing_losses(lw, ls, tgt, msk, c, interp)
            return a + 0.3 * b_ + 0.7 * c_

        def tot_r(lw, ls):
            a, b_, c_ = fused_losses_reference(lw, ls, tgt, msk, c)
            return a + 0.3 * b_ + 0.7 * c_

        vf, gf = jax.value_and_grad(tot_f, argnums=(0, 1))(lw, ls)
        vr, gr = jax.value_and_grad(tot_r, argnums=(0, 1))(lw, ls)
        errs = [jnp.abs(vf - vr)]
        errs += [jnp.max(jnp.abs(a - b)) for a, b in zip(gf, gr)]
        return jnp.max(jnp.stack(errs))

    run_check("fused_loss", check_loss, tol=1e-4)

    # ---- fused ConvLayer ---------------------------------------------------
    def make_check_conv(groups):
        def check_conv():
            from pacingpseudo_tpu.ops.pallas.fused_convbn import (
                conv_bn_lrelu_reference, conv_bn_lrelu_train)
            co = 12 if groups == 1 else 16
            ci, c_log = 8, co // groups
            x = jnp.asarray(rng.randn(2, 32, 24, ci).astype(np.float32))
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            k = jnp.asarray(rng.randn(3, 3, ci, co).astype(np.float32)) * 0.2
            b = jnp.asarray(rng.randn(co).astype(np.float32)) * 0.1
            sc = jnp.asarray(rng.rand(c_log).astype(np.float32) + 0.5)
            be = jnp.asarray(rng.randn(c_log).astype(np.float32) * 0.1)

            def loss(fn, xp, k, b, sc, be):
                zp, m, v = fn(xp, k, b, sc, be, 1e-5, groups, 1e-2)
                wgt = jnp.cos(0.1 * jnp.arange(zp.size).reshape(zp.shape))
                return jnp.sum(zp * wgt) + jnp.sum(m) * 0.0 + jnp.sum(v) * 0.0

            vf, gf = jax.value_and_grad(
                lambda *a: loss(conv_bn_lrelu_train, *a),
                argnums=(0, 1, 2, 3, 4))(xp, k, b, sc, be)
            vr, gr = jax.value_and_grad(
                lambda *a: loss(conv_bn_lrelu_reference, *a),
                argnums=(0, 1, 2, 3, 4))(xp, k, b, sc, be)
            zf = conv_bn_lrelu_train(xp, k, b, sc, be, 1e-5, groups, 1e-2)[0]
            zr = conv_bn_lrelu_reference(xp, k, b, sc, be, 1e-5, groups,
                                         1e-2)[0]
            errs = [jnp.max(jnp.abs(zf - zr)), jnp.abs(vf - vr)]
            # dbias is roundoff-around-zero by construction (groups=1);
            # compare it on absolute scale like the unit test.
            errs += [jnp.max(jnp.abs(a - b)) for a, b in zip(gf, gr)]
            return jnp.max(jnp.stack(errs))

        return check_conv

    run_check("fused_convbn_g1", make_check_conv(1), tol=5e-3)
    run_check("fused_convbn_g4", make_check_conv(4), tol=5e-3)

    # ---- MXU-matmul BN ------------------------------------------------------
    def check_bn():
        from pacingpseudo_tpu.ops.fused_bn import (
            batch_norm_train, batch_norm_train_reduce)
        x = jnp.asarray(rng.randn(4, 32, 32, 16).astype(np.float32))
        sc = jnp.asarray(rng.rand(16).astype(np.float32) + 0.5)
        be = jnp.asarray(rng.randn(16).astype(np.float32) * 0.1)

        def loss(fn, x, sc, be):
            yn, m, v = fn(x, sc, be, 1e-5, 1)
            wgt = jnp.sin(0.05 * jnp.arange(yn.size).reshape(yn.shape))
            return jnp.sum(yn * wgt)

        vf, gf = jax.value_and_grad(
            lambda *a: loss(batch_norm_train, *a), argnums=(0, 1, 2))(
                x, sc, be)
        vr, gr = jax.value_and_grad(
            lambda *a: loss(batch_norm_train_reduce, *a), argnums=(0, 1, 2))(
                x, sc, be)
        errs = [jnp.abs(vf - vr) / jnp.maximum(jnp.abs(vr), 1.0)]
        errs += [jnp.max(jnp.abs(a - b)) for a, b in zip(gf, gr)]
        return jnp.max(jnp.stack(errs))

    run_check("mxu_bn", check_bn, tol=2e-3)

    ok = all(r.get("ok") for r in RESULTS.values())
    print(json.dumps({"backend": backend, "ok": ok, "checks": RESULTS}))
    return 0 if ok else 1


if __name__ == "__main__":
    try:
        sys.exit(main())
    except RuntimeError as e:
        print(f"chip_parity refusing to run: {e}", file=sys.stderr)
        sys.exit(2)
