from entity_deduplication_spark.audio.wav import decode_wav, encode_wav

__all__ = ["decode_wav", "encode_wav"]
