"""Reusable large-scale operators: dedup, similarity, multimodal.

Cache hygiene: operators that persist an internal intermediate attach
it to their result — release with :func:`release_persisted` (or the
:func:`released` context manager) after materializing."""

from .bucketing import bucketed_join, write_bucketed
from .layout import (
    compact_files,
    rowgroup_prune_stats,
    write_zordered,
    zorder_key,
)
from .ann_index import (
    AnnIndex,
    append_ann_index,
    cosine_topk_indexed,
    read_ann_index,
    write_ann_index,
)
from .cache import register_persisted, release_persisted, released
from .classify import quality_classifier_margins, train_lr
from .multimodal import (
    audio_fingerprint,
    audio_fingerprint64,
    dhash64,
    image_dhash,
    split_png_frames,
    video_frame_hashes,
)
from .flows import flow_stats, reassemble_dns_tcp
from .net_enrich import lpm_lookup, parse_routes

__all__ = [
    "AnnIndex",
    "write_ann_index",
    "append_ann_index",
    "read_ann_index",
    "cosine_topk_indexed",
    "register_persisted",
    "release_persisted",
    "released",
    "flow_stats",
    "reassemble_dns_tcp",
    "quality_classifier_margins",
    "train_lr",
    "dhash64",
    "image_dhash",
    "audio_fingerprint",
    "audio_fingerprint64",
    "split_png_frames",
    "video_frame_hashes",
    "lpm_lookup",
    "parse_routes",
    "write_bucketed",
    "bucketed_join",
    "zorder_key",
    "write_zordered",
    "rowgroup_prune_stats",
    "compact_files",
]
