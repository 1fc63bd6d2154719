from ssak_tpu.parallel.mesh import make_mesh, shard_params, replicate
from ssak_tpu.parallel.sharding import WAV2VEC2_RULES, WHISPER_RULES, partition_spec_for

__all__ = ["make_mesh", "shard_params", "replicate", "partition_spec_for", "WHISPER_RULES", "WAV2VEC2_RULES"]
