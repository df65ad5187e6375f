"""Generate docs/LSQR_TPU.LIS — this implementation's recorded listing of
the full 18-problem Paige–Saunders suite, the analogue of the reference's
golden output /root/reference/test/LSQR.LIS (2269 lines; structure per
problem: parameter echo, acheck verdict, iteration log, exit block, xcheck
verdict, solution head, pass/fail — lsqrtest_module.f90:119-272).

Run on CPU in x64 (the conformance precision):

    python benchmarks/make_listing.py            # writes docs/LSQR_TPU.LIS

The committed listing is this build's characterization record: qualitative
parity with the reference's listing is asserted numerically by
tests/test_suite.py (istop/itn/exit norms); the file itself exists so a
reviewer can diff the two listings side by side.
"""

from __future__ import annotations

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

import lsqr_tpu as lt  # noqa: E402
from lsqr_tpu.models.paige_saunders import lstp, suite_configs  # noqa: E402
from lsqr_tpu.ops.blas import nrm2  # noqa: E402
from lsqr_tpu.utils.printing import (  # noqa: E402
    format_exit_block,
    format_header,
    format_iteration_log,
)

OUT = os.path.join(os.path.dirname(__file__), "..", "docs", "LSQR_TPU.LIS")


def run_problem(out, m, n, nduplc, npower, damp):
    eps = np.finfo(np.float64).eps
    prob = lstp(m, n, nduplc, npower, damp)
    atol = btol = eps**0.99
    conlim = 1000.0 * float(prob.acond)
    itnlim = 4 * (m + n + 50)

    out.write(
        f"\n\n --------------------------------------------------------\n"
        f" Least-Squares Test Problem      P({m:5d},{n:5d},{nduplc:4d},{npower:4d})\n"
        f" condition no. ={float(prob.acond): .4e}     residual function ="
        f"{float(prob.rnorm): .4e}\n"
        f" --------------------------------------------------------\n"
    )

    chk = lt.acheck(prob.A)
    if int(chk.inform) == 0:
        out.write("\n acheck: aprod seems to be consistent "
                  f"(error {float(chk.error):.2e}, tol {chk.tol:.2e})\n")
    else:
        out.write("\n acheck: FAILURE — aprod modes disagree "
                  f"(error {float(chk.error):.2e})\n")

    res = lt.lsqr(
        prob.A, prob.b, damp,
        atol=atol, btol=btol, conlim=conlim, itnlim=itnlim,
        record_trace=True,
    )

    out.write(format_header(
        m, n, damp=damp, atol=atol, btol=btol, conlim=conlim,
        itnlim=itnlim, wantse=False,
    ))
    out.write("\n")
    out.write(format_iteration_log(
        res, n=n, itnlim=itnlim, damped=damp > 0,
    ))
    out.write("\n")
    out.write(format_exit_block(res))

    xc = lt.xcheck(prob.A, b=prob.b, x=res.x, damp=damp, anorm=res.anorm)
    out.write(
        f"\n xcheck: inform = {int(xc.inform)}   "
        f"test1 ={float(xc.test1): .2e}   test2 ={float(xc.test2): .2e}   "
        f"test3 ={float(xc.test3): .2e}\n"
    )

    x = np.asarray(res.x)
    out.write("\n Solution  x (first 8 entries):\n")
    for i in range(0, 8, 4):
        out.write("".join(f"{j:8d}{x[j]: .9e}   " for j in range(i, i + 4))
                  + "\n")

    enorm = float(nrm2(res.x - prob.x_true) / (1.0 + nrm2(prob.x_true)))
    etol = 1e-3
    if enorm <= etol:
        out.write(f"\n LSQR  appears to be successful.    "
                  f"Relative error in  x  ={enorm: .2e}\n")
    else:
        out.write(f"\n LSQR  appears to have failed.      "
                  f"Relative error in  x  ={enorm: .2e}\n")
    return int(res.istop), int(res.itn), enorm


def main():
    import io

    buf = io.StringIO()
    buf.write(
        " lsqr_tpu conformance listing — the 18-problem Paige–Saunders "
        "suite\n"
        " (CPU, float64/x64; analogue of the reference's recorded "
        "test/LSQR.LIS)\n"
    )
    rows = []
    for (m, n, nduplc, npower, damp) in suite_configs():
        istop, itn, enorm = run_problem(buf, m, n, nduplc, npower, damp)
        rows.append((m, n, npower, istop, itn, enorm))
        print(f"P({m},{n},{nduplc},{npower}): istop={istop} itn={itn} "
              f"rel.err={enorm:.2e}", flush=True)

    buf.write("\n\n Summary of the 18 problems:\n")
    buf.write("     m     n  npower  istop    itn    rel.err\n")
    for (m, n, p, istop, itn, enorm) in rows:
        buf.write(f" {m:5d} {n:5d} {p:7d} {istop:6d} {itn:6d} {enorm: .2e}\n")

    with open(OUT, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {os.path.normpath(OUT)} "
          f"({len(buf.getvalue().splitlines())} lines)")


if __name__ == "__main__":
    sys.exit(main())
