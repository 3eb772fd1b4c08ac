// Minimal stand-in for the reference's vendored Sophus (submodule not
// checked out in this container). Used ONLY to compile the golden C++
// reference for parity testing (parity/build_reference.sh).
//
// Implements exactly the Sophus surface the reference uses (grepped over
// cpp/include + mains): SO3<S>::exp(.).matrix(), SE3<S>(), SE3<S>(Mat4),
// SE3<S>::exp(tangent [upsilon, omega]), operator*, .matrix(),
// .rotationMatrix(), .translation(). Formulas are the standard closed-form
// SO(3)/SE(3) exponentials with Sophus' tangent ordering (translation
// first), matching utils/se3.py on the Python side.
#pragma once

#include <cmath>
#include <iostream>  // real Sophus pulls this in transitively; some
                     // reference sources rely on that (ColorUpsampler.cpp)
#include <Eigen/Dense>

namespace Sophus {

template <class Scalar>
class SO3 {
public:
    using Mat3 = Eigen::Matrix<Scalar, 3, 3>;
    using Vec3 = Eigen::Matrix<Scalar, 3, 1>;

    SO3() : R_(Mat3::Identity()) {}
    explicit SO3(const Mat3& R) : R_(R) {}

    static Mat3 hat(const Vec3& w) {
        Mat3 W;
        W << Scalar(0), -w[2], w[1],
             w[2], Scalar(0), -w[0],
             -w[1], w[0], Scalar(0);
        return W;
    }

    static SO3 exp(const Vec3& w) {
        const Scalar th2 = w.squaredNorm();
        const Scalar th = std::sqrt(th2);
        Scalar A, B;
        if (th < Scalar(1e-5)) {  // small-angle series
            A = Scalar(1) - th2 / Scalar(6);
            B = Scalar(0.5) - th2 / Scalar(24);
        } else {
            A = std::sin(th) / th;
            B = (Scalar(1) - std::cos(th)) / th2;
        }
        const Mat3 W = hat(w);
        return SO3(Mat3(Mat3::Identity() + A * W + B * (W * W)));
    }

    Mat3 matrix() const { return R_; }

private:
    Mat3 R_;
};

template <class Scalar>
class SE3 {
public:
    using Mat3 = Eigen::Matrix<Scalar, 3, 3>;
    using Mat4 = Eigen::Matrix<Scalar, 4, 4>;
    using Vec3 = Eigen::Matrix<Scalar, 3, 1>;
    using Vec6 = Eigen::Matrix<Scalar, 6, 1>;

    SE3() : R_(Mat3::Identity()), t_(Vec3::Zero()) {}
    explicit SE3(const Mat4& T)
        : R_(T.template topLeftCorner<3, 3>()),
          t_(T.template topRightCorner<3, 1>()) {}
    SE3(const Mat3& R, const Vec3& t) : R_(R), t_(t) {}

    // Sophus tangent ordering: xi = [upsilon (trans), omega (rot)]
    static SE3 exp(const Vec6& xi) {
        const Vec3 v = xi.template head<3>();
        const Vec3 w = xi.template tail<3>();
        const Scalar th2 = w.squaredNorm();
        const Scalar th = std::sqrt(th2);
        Scalar A, B, C;
        if (th < Scalar(1e-5)) {
            A = Scalar(1) - th2 / Scalar(6);
            B = Scalar(0.5) - th2 / Scalar(24);
            C = Scalar(1) / Scalar(6) - th2 / Scalar(120);
        } else {
            A = std::sin(th) / th;
            B = (Scalar(1) - std::cos(th)) / th2;
            C = (Scalar(1) - A) / th2;
        }
        const Mat3 W = SO3<Scalar>::hat(w);
        const Mat3 WW = W * W;
        const Mat3 R = Mat3::Identity() + A * W + B * WW;
        const Mat3 V = Mat3::Identity() + B * W + C * WW;
        return SE3(R, Vec3(V * v));
    }

    SE3 operator*(const SE3& o) const {
        return SE3(Mat3(R_ * o.R_), Vec3(R_ * o.t_ + t_));
    }

    Mat4 matrix() const {
        Mat4 T = Mat4::Identity();
        T.template topLeftCorner<3, 3>() = R_;
        T.template topRightCorner<3, 1>() = t_;
        return T;
    }

    Mat3 rotationMatrix() const { return R_; }
    Vec3 translation() const { return t_; }

private:
    Mat3 R_;
    Vec3 t_;
};

}  // namespace Sophus
