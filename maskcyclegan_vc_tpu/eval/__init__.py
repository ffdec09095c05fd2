from maskcyclegan_vc_tpu.eval.f0 import (  # noqa: F401
    f0_from_log_mel,
    f0_from_waveform,
    median_f0,
    utterance_f0,
)
from maskcyclegan_vc_tpu.eval.mcep import (  # noqa: F401
    freqt,
    mcd_dtw_wav,
    mcep_from_wav,
)
from maskcyclegan_vc_tpu.eval.metrics import (  # noqa: F401
    log_mel_cepstra,
    mcd,
    mcd_dtw,
    mel_spectral_distance,
)
