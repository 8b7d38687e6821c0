"""Known-fatal program shapes on the tunneled TPU worker (QUIRKS.md).

Bisected 2026-08-19 on the axon-tunneled v5e: the SumGAN 3-phase train step
with a 20-video group on a pack padded to T=648 (SumMe fixture, max
n_steps 641 rounded to 8) kills the worker process deterministically —
independent of int8/bf16, remat, split_phases, and the Pallas RNN kernels;
the VAE pretrain at the same shape, TVSum's (20, 640), and groups <= 16 at
T=648 all run.  An XLA-TPU backend fault, not a program bug.

The sweep used to dodge this only through DATASET_OVERRIDES pinning
batch_size=10 on summe — nothing stopped a future fixture regeneration or
bucket change from silently re-landing on the shape (VERDICT r3 weak #6).
``guard_padded_t`` encodes the constraint as a PADDING rule: padding T is
semantically free (packs are fully masked), so a fatal (group, T) is nudged
to the next 8-step pad.  ``scripts/repro_worker_abort.py`` is the minimized
standalone repro for the platform bug report.
"""

from __future__ import annotations

import logging

# (engine tag, group size, padded T) -> worker abort.  Group sizes ABOVE a
# listed fatal one are treated as fatal too at the same T (bisected: 20
# fatal, <= 16 fine; larger groups are the same program with more streaming).
KNOWN_FATAL = {
    ("sumgan_3phase", 20, 648),
    # Round-4 live bisection (GAN x LOL sweep): the (group 4, T=1024)
    # 3-phase int8 program killed the worker twice in a row within the
    # first two groups (heartbeat payloads: "3phase group=0/2 B=4 bt=1024",
    # then group=1 after a post-pretrain resume), while the same program at
    # T=3200 runs repeatedly in isolation.  Suspected second instance of
    # the same backend fault family; padding to 1032 dodges it.
    ("sumgan_3phase", 4, 1024),
    # Same sweep, same signature: attempts 7 and 8 each died at
    # "3phase group=1/2 B=4 bt=3072" (after the 1024 guard let them run
    # 30 min through every bucket below).  (4, 3200) is proven good by
    # repeated isolated runs, so nudging 3072 -> 3080 stays in known-good
    # territory.
    ("sumgan_3phase", 4, 3072),
}

_FATAL_BY_TAG_T: dict[tuple[str, int], int] = {}
for _tag, _bs, _t in KNOWN_FATAL:
    key = (_tag, _t)
    _FATAL_BY_TAG_T[key] = min(_bs, _FATAL_BY_TAG_T.get(key, _bs))


def is_fatal(tag: str, batch_size: int, padded_t: int) -> bool:
    bs_min = _FATAL_BY_TAG_T.get((tag, padded_t))
    return bs_min is not None and batch_size >= bs_min


def guard_padded_t(tag: str | None, batch_size: int, padded_t: int,
                   quantum: int = 8) -> int:
    """Return a safe padded length: ``padded_t`` itself, or the next
    ``quantum`` multiple past every known-fatal (tag, batch_size, T)."""
    if tag is None:
        return padded_t
    t = padded_t
    while is_fatal(tag, batch_size, t):
        t += quantum
    if t != padded_t:
        logging.getLogger("summarizer_tpu").warning(
            f"shape guard: ({tag}, group {batch_size}, T {padded_t}) is a "
            f"known worker-fatal program shape (QUIRKS.md); padding T to {t}"
        )
    return t
