"""Audio operators (decoders.Audio, spectrogram chain) — populated in the audio
milestone; reference ``dali/operators/audio/``, ``decoder/audio/``."""
