"""time_r1_tpu — a TPU-native framework for RL post-training of video-language
models on Temporal Video Grounding (capability parity with xiaomi-research/time-r1).

Layer map (bottom → top):

- ``time_r1_tpu.ops``       Pallas TPU kernels (flash attention, paged decode
                            attention, fused video preprocessing).
- ``time_r1_tpu.parallel``  Device mesh + GSPMD sharding rules (FSDP/TP axes).
- ``time_r1_tpu.models``    JAX Qwen2.5-VL (ViT w/ window attention, M-RoPE
                            decoder) + safetensors weight converter + processor.
- ``time_r1_tpu.video``     Host video decode (C++ FFmpeg lib) + device-side
                            resize/patchify pipeline.
- ``time_r1_tpu.sampler``   Continuous-batching inference engine (paged KV,
                            chunked prefill, on-device decode loop).
- ``time_r1_tpu.rl``        GRPO trainer (pjit train step, group advantages,
                            PPO-clip / vanilla GRPO losses, KL vs ref weights).
- ``time_r1_tpu.data``      Benchmark dataset loaders and eval dataloaders.
- ``time_r1_tpu.utils``     Pure-math core: vision budgeting, rewards, metric
                            parsing, IoU scoring, curriculum sampling.
- ``time_r1_tpu.cli``       Entry points (train / finetune / evaluate / demo /
                            eval_all / calc_difficulty / process_data / train_sf).
"""

__version__ = "0.1.0"
