"""Property-based invariants (hypothesis) for tile geometry and the prompt
grammar — the reference's implicit invariants (SURVEY.md §4) under random
inputs, not just golden cases."""
import numpy as np
from hypothesis import given, settings, strategies as st

from mdu_tpu.text.prompt import (
    extract_networks,
    parse_prompt_attention,
    parse_prompt_schedule,
    split_composable,
)
from mdu_tpu.tiling.tiled_vae import plan_vae_tiles
from mdu_tpu.utils import paint_count, split_grid


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(16, 1200), h=st.integers(16, 1200),
    tile=st.integers(8, 256), overlap=st.integers(0, 128),
)
def test_split_grid_always_covers(w, h, tile, overlap):
    tw = min(tile, w)
    th = min(tile, h)
    overlap = min(overlap, min(tw, th) - 4) if min(tw, th) > 4 else 0
    bboxes = split_grid(w, h, tw, th, max(overlap, 0))
    count = paint_count(w, h, bboxes)
    assert (count > 0).all()
    for b in bboxes:
        assert 0 <= b.x and b.x + b.w <= w
        assert 0 <= b.y and b.y + b.h <= h


@settings(max_examples=100, deadline=None)
@given(h=st.integers(24, 800), w=st.integers(24, 800),
       tile=st.integers(16, 256), pad=st.sampled_from([11, 32]))
def test_vae_plan_owned_partition(h, w, tile, pad):
    plan = plan_vae_tiles(h, w, tile, pad)
    if plan is None:
        assert max(h, w) <= pad * 2 + tile
        return
    cover = np.zeros((h, w), np.int16)
    for (y0, y1, x0, x1) in plan.owned:
        cover[y0:y1, x0:x1] += 1
    assert (cover == 1).all()
    for (oy, ox) in plan.in_origins:
        assert 0 <= oy <= h - plan.in_h
        assert 0 <= ox <= w - plan.in_w


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=120))
def test_prompt_grammar_total(text):
    """The grammar must be total: any input parses without raising."""
    frags = parse_prompt_attention(text)
    assert all(isinstance(f, str) for f, _ in frags)
    assert all(w > 0 or f == "BREAK" for f, w in frags)
    parse_prompt_schedule(text, 10)
    split_composable(text)
    clean, nets = extract_networks(text)
    assert isinstance(clean, str)


@settings(max_examples=100, deadline=None)
@given(st.integers(1, 60), st.integers(1, 59))
def test_schedule_boundaries_ordered(steps, when):
    sched = parse_prompt_schedule(f"a [x:y:{when}] b", steps)
    ends = [e for e, _ in sched]
    assert ends == sorted(ends)
    assert ends[-1] == steps
