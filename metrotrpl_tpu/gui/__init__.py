"""Posterior visualization GUI (tkinter + matplotlib).

Capability-equivalent to the reference's GUI package (reference GUI/window.py,
tkgui.py, mc_plot.py, quicksim.py, secondary_parameters.py, popups): loads
pickled Ensembles (ours or the reference's), draws 1D/2D trace plots and
histograms with burn-in control, computes derived secondary parameters,
exports CSV/NPY, runs quicksim re-simulations of posterior states in a
background process, and reports the chain-diffusion diagnostic.
"""

from metrotrpl_tpu.gui.secondary_parameters import SecondaryParameters  # noqa: F401
