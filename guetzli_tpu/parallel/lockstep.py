"""Lockstep corpus quant-matrix search (phase 2 of the NOTES.md
lockstep batched-corpus design).

The reference encodes one image per process and its quant binary search
(SelectQuantMatrix, processor.cc:340-372) serializes a device round trip
per trial. Across a corpus those trials are independent, so each lockstep
round here dispatches EVERY active image's trial compare before fetching
any of them: the device programs and the pull round trips overlap across
the corpus, while each image's decision sequence stays bit-identical to
the serial search -- a decision depends only on that image's own
distances.

Each image keeps its own Processor/Comparator (per-image logs, stats and
MaybeOutput exactly as in the serial path); only the dispatch/fetch
ordering is interleaved.
"""

from guetzli_tpu.search.processor import QuantMatrixGenerator

_TARGET_MUL_HIGH = 0.97
_TARGET_MUL_LOW = 0.95


class _QuantSearch:
    """One image's SelectQuantMatrix state machine (the non-speculative
    loop of Processor.select_quant_matrix, split at the fetch point)."""

    def __init__(self, proc, jpg_in, downsample, best_q, img):
        self.proc = proc
        self.jpg_in = jpg_in
        self.best_q = best_q
        self.img = img
        self.qgen = QuantMatrixGenerator(downsample)
        self.cur_q = best_q.copy()
        self.initial = True
        self.best = None
        self.done = False
        self.pending = None

    def dispatch(self):
        """Issue the current trial's device compare (async)."""
        self.pending = self.proc._quant_eval_start(self.jpg_in, self.cur_q)

    def resolve(self):
        """Fetch the trial, advance the binary search, set up the next
        trial's quant matrix (or finish)."""
        dist_ok, size = self.proc._quant_resolve(
            self.jpg_in, self.cur_q, *self.pending, self.img,
            _TARGET_MUL_HIGH)
        if self.initial:
            self.best = (self.cur_q.copy(), dist_ok, size)
            self.initial = False
        else:
            self.qgen.add(self.cur_q, dist_ok)
            better = ((dist_ok and not self.best[1])
                      or (dist_ok == self.best[1] and size < self.best[2]))
            if better:
                self.best = (self.cur_q.copy(), dist_ok, size)
                if dist_ok and not self.proc.comparator.distance_ok(
                        _TARGET_MUL_LOW):
                    self._finish()
                    return
        qn = self.qgen.get_next()
        if qn is None:
            self._finish()
            return
        self.cur_q = qn

    def _finish(self):
        self.best_q[:] = self.best[0]
        self.done = True


def lockstep_select_quant_matrix(procs, jpgs, downsamples, best_qs, imgs):
    """Run every image's quant-matrix search in lockstep rounds.

    Args are per-image lists; `best_qs` entries are mutated in place like
    Processor.select_quant_matrix's best_q. Returns the per-image dist_ok
    list (the serial method's return value).
    """
    sms = [_QuantSearch(p, j, d, q, i)
           for p, j, d, q, i in zip(procs, jpgs, downsamples, best_qs,
                                    imgs)]
    while True:
        active = [s for s in sms if not s.done]
        if not active:
            break
        for s in active:          # dispatch-all: device work overlaps
            s.dispatch()
        for s in active:          # fetch-all, in corpus order
            s.resolve()
    return [s.best[1] for s in sms]
