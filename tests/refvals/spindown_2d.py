"""Reference-generated golden statistics, ported verbatim from
test/Ocean/refvals/2D_hydrostatic_spindown_refvals.jl (public numeric
regression data for test/Ocean/ShallowWater/test_2D_spindown.jl: 24 h
LSRK54 run, dt = 300 s, 5x5 p4 periodic box 1e6 x 1e6, H = 400 m,
ShallowWaterModel + ConstantViscosity(5e3), central first-order flux).

Row format: {(label, field): [min, max, mean, std]} (std ddof=1);
``parr`` = reference per-statistic significant-digit requirements.
"""

parr = {
    ("state", "eta"): [12, 12, 0, 12],
    ("state", "U[0]"): [12, 12, 0, 12],
    ("state", "U[1]"): [0, 0, 0, 0],
}

explicit = {
    ("state", "eta"): [-8.52722969951589915283e-01, 8.52846676313531282254e-01,
                       -2.49578135935735214742e-16, 6.03454239990563690021e-01],
    ("state", "U[0]"): [-3.15431401945821825450e+01, 3.15431401945818628008e+01,
                        6.11504145930918957291e-15, 2.24273815174625497093e+01],
    ("state", "U[1]"): [-7.62224398365580242501e-13, 9.72156930292624284356e-13,
                        1.39269607441935025982e-14, 1.95606703846656748360e-13],
}
