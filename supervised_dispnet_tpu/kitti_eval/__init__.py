"""KITTI evaluation harnesses (Eigen depth split, odometry pose)."""
