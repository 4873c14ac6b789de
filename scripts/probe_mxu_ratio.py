"""Analyze HOW the in-loop MXU gather corrupts albedo: per-channel ratios
radiance_mxu / radiance_radix at depth 2 (rays that hit once then escape
carry exactly one albedo factor)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

out = sys.argv[1]
os.environ.setdefault("RT_GATHER", "radix")
from probe_mxu_render import run
rad, seg = run(2)
np.save(out, rad)
print("saved", out, "seg", seg)
