// Diagnostic probe for the golden parity harness (PARITY.md open item):
// replays the reference PhotoBA phase 1 (track + fuse, all frames
// keyframe-eligible as in the synth preset), then re-computes the
// photometric energy with full instrumentation — per-frame visibility
// density over the |dist| <= voxel_size gate, residual counts, and the
// energy with and without the visibility gate. Links the reference's own
// libraries, so the numbers are the reference's ground truth.
//
// Build/run: see parity/build_reference.sh (same include paths), e.g.
//   g++ -O2 -std=c++17 parity/probe_energy.cpp -isystem parity/refshim \
//       -isystem $TF_EIGEN -I /root/reference/cpp/include \
//       -I /root/reference/cpp/third $(pkg-config --cflags --libs opencv4) \
//       /tmp/refbuild/libsdf_tracker_lib.a -o /tmp/probe_energy
//   /tmp/probe_energy /tmp/vd640/ 0.02 5
#include <cstdio>
#include <memory>
#include <vector>
#include <Eigen/Dense>
#include <opencv2/core/core.hpp>
#include "normals/NormalEstimator.h"
#include "sdf_tracker/MapGradPixelSdf.h"
#include "sdf_tracker/RigidPointOptimizer.h"
#include "img_loader/img_loader.h"
#include "mat.h"

static Vec3f bilerp(const float row, const float col, const cv::Mat& img) {
    int x = std::floor(row), y = std::floor(col);
    cv::Vec3f t = (y + 1.0f - col) * (row - x) * img.at<cv::Vec3f>(x + 1, y)
        + (y + 1.0f - col) * (x + 1.0f - row) * img.at<cv::Vec3f>(x, y)
        + (col - y) * (row - x) * img.at<cv::Vec3f>(x + 1, y + 1)
        + (col - y) * (x + 1.0f - row) * img.at<cv::Vec3f>(x, y + 1);
    return Vec3f(t[0], t[1], t[2]);
}

int main(int argc, char** argv) {
    std::string input = argc > 1 ? argv[1] : "/tmp/vd640/";
    float voxel_size = argc > 2 ? std::atof(argv[2]) : 0.02f;
    float trunc_factor = argc > 3 ? std::atof(argv[3]) : 5.0f;

    SynthLoader loader(input);
    if (!loader.load_intrinsics("intrinsics.txt")) { puts("no K"); return 1; }
    Mat3f K = loader.K();

    auto* NEst = new cv::NormalEstimator<float>(640, 480, K,
                                                cv::Size(11, 11));
    MapGradPixelSdf* tSDF = nullptr;
    RigidPointOptimizer* pOpt = nullptr;

    cv::Mat color, depth;
    std::vector<cv::Mat> images;
    std::vector<Mat4f, Eigen::aligned_allocator<Mat4f>> poses;
    for (int i = 0; loader.load_next(color, depth); ++i) {
        if (i == 0) {
            tSDF = new MapGradPixelSdf(voxel_size,
                                       trunc_factor * voxel_size);
            tSDF->setup(color, depth, K, NEst);
            pOpt = new RigidPointOptimizer(tSDF);
            poses.push_back(Mat4f::Identity());
        } else {
            bool conv = pOpt->optimize(depth, K);
            if (!conv) { printf("frame %d not converged\n", i); continue; }
            tSDF->update(color, depth, K, pOpt->pose(), NEst);
            poses.push_back(pOpt->pose().matrix());
        }
        cv::Mat c2; color.copyTo(c2);
        images.push_back(c2);
    }
    printf("frames: %zu\n", poses.size());

    const int kf[3] = {0, 3, 5};
    auto tsdf = tSDF->get_tsdf();
    auto& vis = tSDF->get_vis();

    size_t gated = 0;
    size_t vis_count[3] = {0, 0, 0};
    size_t inimg_count[3] = {0, 0, 0};
    double E_vis = 0.0, E_novis = 0.0;
    size_t nres_vis = 0, nres_novis = 0;

    for (const auto& vp : tsdf) {
        const Vec3i idx = vp.first;
        const SdfVoxel& v = vp.second;
        if (std::fabs(v.dist) > voxel_size) continue;
        ++gated;
        const std::vector<bool>& vb = vis.at(idx);
        // vox2float is private; same formula (MapGradPixelSdf.h:79-81)
        Vec3f x = voxel_size * idx.cast<float>()
                  - v.dist * v.grad.normalized();

        Vec3f A[3];
        bool ok_img[3], ok_vis[3];
        for (int j = 0; j < 3; ++j) {
            int f = kf[j];
            ok_vis[j] = (vb.size() > (size_t)f && vb[f]);
            Mat3f R = poses[f].topLeftCorner(3, 3);
            Vec3f t = poses[f].topRightCorner(3, 1);
            Vec3f p = R.transpose() * (x - t);
            float m = K(0, 0) * p[0] / p[2] + K(0, 2);
            float n = K(1, 1) * p[1] / p[2] + K(1, 2);
            ok_img[j] = !(m < 0 || m >= images[f].cols || n < 0 ||
                          n >= images[f].rows);
            if (ok_img[j]) A[j] = bilerp(n, m, images[f]);
            if (ok_vis[j]) ++vis_count[j];
            if (ok_img[j]) ++inimg_count[j];
        }
        for (int mode = 0; mode < 2; ++mode) {  // 0: vis-gated, 1: img-only
            Vec3f mean = Vec3f::Zero();
            int N = 0;
            for (int j = 0; j < 3; ++j) {
                bool use = ok_img[j] && (mode == 1 || ok_vis[j]);
                if (use) { mean += A[j]; ++N; }
            }
            if (!N) continue;
            mean /= (float)N;
            for (int j = 0; j < 3; ++j) {
                bool use = ok_img[j] && (mode == 1 || ok_vis[j]);
                if (!use) continue;
                float e = (A[j] - mean).squaredNorm();
                if (mode == 0) { E_vis += e; ++nres_vis; }
                else           { E_novis += e; ++nres_novis; }
            }
        }
    }
    printf("gated voxels (|d|<=vs): %zu\n", gated);
    for (int j = 0; j < 3; ++j)
        printf("frame %d: vis %zu  in-image %zu\n",
               kf[j], vis_count[j], inimg_count[j]);
    printf("E (vis-gated)  = %.4f over %zu residuals\n", E_vis, nres_vis);
    printf("E (image-only) = %.4f over %zu residuals\n", E_novis, nres_novis);
    return 0;
}
