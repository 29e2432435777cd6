import time, os
os.environ["GUETZLI_TPU_STAGED_ZEROING"] = "1"
import numpy as np
from guetzli_tpu.runtime import configure
configure()
from guetzli_tpu.io.png import read_png
from guetzli_tpu.search.processor import Params, ProcessStats, process_rgb
from guetzli_tpu import consts
rgb, w, h = read_png(open('/tmp/golden/bees_1mpix.png','rb').read())
params = Params(); params.butteraugli_target = consts.butteraugli_score_for_quality(95)
t0=time.time()
out = process_rgb(params, rgb, w, h, ProcessStats())
print("staged cold: %.1fs, %d bytes" % (time.time()-t0, len(out)))
t0=time.time()
out = process_rgb(params, rgb, w, h, ProcessStats())
dt=time.time()-t0
print("staged warm: %.1fs = %.4f MPix/s, %d bytes" % (dt, w*h/1e6/dt, len(out)))
