"""The reference README example (/root/reference/README.md:24-58): solve a
3x3 dense system given as a COO triple. Expected output: istop = 1,
x = (1.242424, -0.06060606, -0.04040404)."""

import lsqr_tpu as lt

solver = lt.LSQRSolver(
    m=3,
    n=3,
    a=[1, 4, 7, 2, 5, 88, 3, 66, 9],
    irow=[0, 1, 2, 0, 1, 2, 0, 1, 2],
    icol=[0, 0, 0, 1, 1, 1, 2, 2, 2],
)
res = solver.solve(b=[1, 2, 3], damp=0.0)
print("istop =", int(res.istop), "->", res.istop_message)
print("x     =", res.x)
