import time, sys
import numpy as np
import jax
from guetzli_tpu.io.png import read_png
from guetzli_tpu.search import processor as P
from guetzli_tpu import consts

rgb, w, h = read_png(open('/tmp/golden/bees.png','rb').read())
params = P.Params(); params.butteraugli_target = consts.butteraugli_score_for_quality(95)

# monkeypatch timers
times = {}
def wrap(cls, name):
    orig = getattr(cls, name)
    def f(*a, **k):
        t0 = time.time(); r = orig(*a, **k)
        times[name] = times.get(name, 0.0) + time.time() - t0
        return r
    setattr(cls, name, f)
for m in ("select_quant_matrix", "select_frequency_masking", "select_frequency_back_end", "output_jpeg", "_compare"):
    wrap(P.Processor, m)

# warm
t0 = time.time(); P.process_rgb(params, rgb, w, h, P.ProcessStats()); warm = time.time()-t0
times.clear()
t0 = time.time(); out = P.process_rgb(params, rgb, w, h, P.ProcessStats()); dt = time.time()-t0
print("warm", round(warm,1), "timed", round(dt,2), "size", len(out))
for k, v in sorted(times.items(), key=lambda kv: -kv[1]):
    print(f"  {k}: {v:.2f}s")
print("  (masking includes backend; backend includes compare/output)")
