"""Entry points (L4 parity): train / finetune / evaluate / demo / eval_all /
calc_difficulty / process_data / preprocess_videos / train_sf."""
