# Shim: point the reference build at the Eigen bundled with tensorflow.
set(EIGEN3_INCLUDE_DIRS /opt/venv/lib/python3.12/site-packages/tensorflow/include)
set(EIGEN3_INCLUDE_DIR ${EIGEN3_INCLUDE_DIRS})
set(EIGEN3_DEFINITIONS "")
set(EIGEN3_FOUND TRUE)
set(Eigen3_FOUND TRUE)
