from rollout_bo_tpu.utils import metrics, logging, checkpoint, profiling, lazy, experiment
