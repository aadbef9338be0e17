from prom_etl_db_spark.functions import (
    clustering,
    decontam,
    dedup,
    flac,
    gorilla,
    jpeg,
    linkage,
    mpeg_audio,
    multimodal,
    phash,
    quality,
    sampling,
    similarity,
    sketches,
    spectral,
    suffix,
    text,
    unigram,
    urlnorm,
    video,
)

__all__ = [
    "clustering", "decontam", "dedup", "flac", "gorilla", "jpeg",
    "linkage", "mpeg_audio", "multimodal", "phash", "quality",
    "sampling", "similarity", "sketches", "spectral", "suffix",
    "text", "unigram", "urlnorm", "video",
]
