from maskcyclegan_vc_tpu.eval.metrics import (  # noqa: F401
    log_mel_cepstra,
    mcd,
    mcd_dtw,
    mel_spectral_distance,
)
