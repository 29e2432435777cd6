"""Length-limited Huffman code construction and canonical code tables.

Reimplements the reference's exact algorithms (guetzli/entropy_encode.cc,
guetzli/jpeg_data_writer.cc:131-180) including tie-breaking, because the
emitted DHT segments and bitstream must match bit-for-bit in tests against
the reference encoder's output.
"""

from typing import Tuple

import numpy as np

K_MAX_BIT_LENGTH = 16
K_ALPHABET = 257   # 256 symbols + the guard symbol with count 1


_TREE_CACHE = {}
_TREE_CACHE_MAX = 20000


def create_huffman_tree_cached(counts, tree_limit=K_MAX_BIT_LENGTH):
    """Memoized create_huffman_tree.

    The back-end search recomputes entropy codes every 10 coefficient
    flips (processor.cc:879-884) but usually only one of the histograms
    changed; identical histograms recur constantly across iterations.
    """
    counts = np.asarray(counts, dtype=np.int64)
    key = (counts.tobytes(), tree_limit)
    hit = _TREE_CACHE.get(key)
    if hit is None:
        if len(_TREE_CACHE) >= _TREE_CACHE_MAX:
            _TREE_CACHE.clear()
        hit = create_huffman_tree(counts, tree_limit)
        _TREE_CACHE[key] = hit
    return hit


def create_huffman_tree(counts, tree_limit=K_MAX_BIT_LENGTH):
    """Return depths uint8[len(counts)] (entropy_encode.cc:746-818).

    Two-queue Huffman with a doubling count floor until the depth limit is
    met; leaves are seeded in descending symbol order and sorted by
    (count asc, symbol desc).
    """
    counts = np.asarray(counts, dtype=np.uint64)
    length = len(counts)
    depth = np.zeros(length, dtype=np.uint8)
    count_limit = 1
    while True:
        # Leaves in descending symbol order, then a stable-equivalent sort by
        # (count asc, symbol desc) — the comparator is a total order here.
        sym = np.nonzero(counts)[0][::-1]
        cnt = np.maximum(counts[sym], count_limit).astype(np.int64)
        n = len(sym)
        if n == 0:
            return depth
        if n == 1:
            depth[sym[0]] = 1
            return depth
        order = np.lexsort((-sym, cnt))
        cnt = cnt[order].tolist()
        sym = sym[order].tolist()

        # Two-queue merge: nodes as (count, left, right); leaf = (count, sym).
        big = float('inf')
        leaf_counts = cnt + [big, big]
        internal = []          # (count, left_ref, right_ref)
        refs = []              # parallel structure for tree walking
        i = 0                  # next leaf
        j = 0                  # next internal
        parents = []
        for _ in range(n - 1):
            picks = []
            for _ in range(2):
                ic = leaf_counts[i]
                jc = internal[j][0] if j < len(internal) else big
                if ic <= jc:
                    picks.append(('leaf', i))
                    i += 1
                else:
                    picks.append(('node', j))
                    j += 1
            c = 0
            for kind, idx in picks:
                c += cnt[idx] if kind == 'leaf' else internal[idx][0]
            internal.append((c, picks[0], picks[1]))
        # Depth assignment by walking from the root (last internal node).
        ok = True
        stack = [(len(internal) - 1, 0)]
        while stack:
            node, level = stack.pop()
            if level + 1 > tree_limit:
                ok = False
                break
            _, left, right = internal[node]
            for kind, idx in (left, right):
                if kind == 'leaf':
                    depth[sym[idx]] = np.uint8(level + 1)
                else:
                    stack.append((idx, level + 1))
        if ok:
            return depth
        count_limit *= 2


def build_huffman_code(depths) -> Tuple[np.ndarray, np.ndarray]:
    """depths -> (counts int32[17], values int32[...]) like the reference's
    BuildHuffmanCode (jpeg_data_writer.cc:131-146)."""
    depths = np.asarray(depths)
    counts = np.zeros(K_MAX_BIT_LENGTH + 1, dtype=np.int32)
    present = np.nonzero(depths)[0]
    for s in present:
        counts[depths[s]] += 1
    values = present[np.argsort(depths[present], kind='stable')]
    return counts, values.astype(np.int32)


def build_code_table(counts, values):
    """Canonical (depth uint8[256+], code int32[256+]) like
    BuildHuffmanCodeTable (jpeg_data_writer.cc:148-180); the last value in
    canonical order (the guard symbol) is excluded."""
    depth = np.full(K_ALPHABET, 255, dtype=np.uint8)
    code = np.zeros(K_ALPHABET, dtype=np.int32)
    huffsize = []
    for ln in range(1, K_MAX_BIT_LENGTH + 1):
        huffsize.extend([ln] * int(counts[ln]))
    if not huffsize:
        return depth, code
    lastp = len(huffsize) - 1
    huffsize[lastp] = 0

    c = 0
    si = huffsize[0] if huffsize else 0
    huffcode = []
    p = 0
    while p < len(huffsize) and huffsize[p]:
        while p < len(huffsize) and huffsize[p] == si:
            huffcode.append(c)
            c += 1
            p += 1
        c <<= 1
        si += 1
    for p in range(lastp):
        v = int(values[p])
        depth[v] = np.uint8(huffsize[p] if p < lastp else 0)
        code[v] = huffcode[p]
    return depth, code
