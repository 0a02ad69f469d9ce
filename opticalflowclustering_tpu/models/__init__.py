from opticalflowclustering_tpu.models.bounce_classifier import (
    BounceClassifier,
    init_classifier,
    make_train_step,
    train_on_hue_windows,
)
