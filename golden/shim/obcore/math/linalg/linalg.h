/* Minimal drop-in for the reference's GSL-backed linear algebra layer
 * (obcore/math/linalg/{linalg.h,gsl/Matrix.h,gsl/Vector.h,MatrixFactory.h}).
 *
 * Purpose: GSL is not installed in this image, so the golden-file parity
 * harness (golden/harness.cpp) compiles the reference's grid/raycast
 * sources from /root/reference against THIS header instead.  It is an
 * original implementation of exactly the API subset those sources use:
 *
 *   Matrix(rows, cols, data), copy/submatrix ctors, operator=,
 *   operator()(r,c), operator*(Matrix,Matrix), operator*=,
 *   setIdentity(), invert() [Gauss-Jordan], static
 *   multiply(A, B, transposeA, transposeB), getRows(), getCols(), print().
 *
 * Dense row-major double storage.  All matrices in the grid/raycast
 * subset are tiny (3x3 poses, 2xB ray maps, Nx3 homogeneous coords), so a
 * plain triple loop is exact and fast enough for golden generation.  GSL
 * dgemm and this code sum products in the same (row-major, k-inner) order
 * for these shapes, so results agree bitwise for the sizes involved.
 */
#ifndef GOLDEN_SHIM_LINALG_H
#define GOLDEN_SHIM_LINALG_H

#include <cassert>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <iostream>
#include <vector>

/* The reference's gsl/Matrix.h does `using namespace std;` at header
 * scope and the reference .cpp files rely on it (unqualified vector,
 * isnan, min/max).  Reproduced here for faithful compilation. */
using namespace std;

namespace obvious
{

class Matrix
{
public:
  Matrix(unsigned int rows, unsigned int cols, double* data = 0)
      : _rows(rows), _cols(cols), _data(new double[rows * cols])
  {
    if(data)
      std::memcpy(_data, data, sizeof(double) * rows * cols);
    else
      std::memset(_data, 0, sizeof(double) * rows * cols);
  }

  Matrix(const Matrix& M)
      : _rows(M._rows), _cols(M._cols), _data(new double[M._rows * M._cols])
  {
    std::memcpy(_data, M._data, sizeof(double) * _rows * _cols);
  }

  /* submatrix copy ctor (reference: Matrix(Matrix M, i, j, rows, cols)) */
  Matrix(Matrix M, unsigned int i, unsigned int j, unsigned int rows,
         unsigned int cols)
      : _rows(rows), _cols(cols), _data(new double[rows * cols])
  {
    assert(i + rows <= M._rows && j + cols <= M._cols);
    for(unsigned int r = 0; r < rows; r++)
      for(unsigned int c = 0; c < cols; c++)
        (*this)(r, c) = M(i + r, j + c);
  }

  ~Matrix() { delete[] _data; }

  Matrix& operator=(const Matrix& M)
  {
    if(this == &M) return *this;
    if(_rows * _cols != M._rows * M._cols)
    {
      delete[] _data;
      _data = new double[M._rows * M._cols];
    }
    _rows = M._rows;
    _cols = M._cols;
    std::memcpy(_data, M._data, sizeof(double) * _rows * _cols);
    return *this;
  }

  double& operator()(unsigned int r, unsigned int c)
  {
    return _data[r * _cols + c];
  }

  double operator()(unsigned int r, unsigned int c) const
  {
    return _data[r * _cols + c];
  }

  Matrix& operator*=(const Matrix& M)
  {
    *this = multiply(*this, M, false, false);
    return *this;
  }

  friend Matrix operator*(const Matrix& A, const Matrix& B)
  {
    return multiply(A, B, false, false);
  }

  static Matrix multiply(const Matrix& A, const Matrix& B, bool transposeA,
                         bool transposeB)
  {
    unsigned int m = transposeA ? A._cols : A._rows;
    unsigned int k = transposeA ? A._rows : A._cols;
    unsigned int k2 = transposeB ? B._cols : B._rows;
    unsigned int n = transposeB ? B._rows : B._cols;
    assert(k == k2);
    (void)k2;
    Matrix R(m, n);
    for(unsigned int i = 0; i < m; i++)
      for(unsigned int j = 0; j < n; j++)
      {
        double acc = 0.0;
        for(unsigned int p = 0; p < k; p++)
        {
          double a = transposeA ? A(p, i) : A(i, p);
          double b = transposeB ? B(j, p) : B(p, j);
          acc += a * b;
        }
        R(i, j) = acc;
      }
    return R;
  }

  void setIdentity()
  {
    std::memset(_data, 0, sizeof(double) * _rows * _cols);
    unsigned int n = _rows < _cols ? _rows : _cols;
    for(unsigned int i = 0; i < n; i++) (*this)(i, i) = 1.0;
  }

  void setZero() { std::memset(_data, 0, sizeof(double) * _rows * _cols); }

  /* In-place inversion via Gauss-Jordan with partial pivoting.  Used only
   * on small (3x3) homogeneous transforms in the grid subset. */
  void invert()
  {
    assert(_rows == _cols);
    unsigned int n = _rows;
    Matrix aug(n, 2 * n);
    for(unsigned int i = 0; i < n; i++)
    {
      for(unsigned int j = 0; j < n; j++) aug(i, j) = (*this)(i, j);
      aug(i, n + i) = 1.0;
    }
    for(unsigned int col = 0; col < n; col++)
    {
      unsigned int piv = col;
      for(unsigned int r = col + 1; r < n; r++)
        if(std::fabs(aug(r, col)) > std::fabs(aug(piv, col))) piv = r;
      if(piv != col)
        for(unsigned int j = 0; j < 2 * n; j++)
        {
          double t = aug(col, j);
          aug(col, j) = aug(piv, j);
          aug(piv, j) = t;
        }
      double d = aug(col, col);
      assert(d != 0.0);
      double dinv = 1.0 / d;
      for(unsigned int j = 0; j < 2 * n; j++) aug(col, j) *= dinv;
      for(unsigned int r = 0; r < n; r++)
      {
        if(r == col) continue;
        double f = aug(r, col);
        if(f == 0.0) continue;
        for(unsigned int j = 0; j < 2 * n; j++) aug(r, j) -= f * aug(col, j);
      }
    }
    for(unsigned int i = 0; i < n; i++)
      for(unsigned int j = 0; j < n; j++) (*this)(i, j) = aug(i, n + j);
  }

  /* array[i,:] = array[i,:] * M1^T, i.e. each row treated as a point and
   * multiplied by M1 (gsl/Matrix.cpp:489-497 — dgemm NoTrans/Trans).
   * Used by Icp::applyTransformation's rotation step. */
  static void multiply(const Matrix& M1, double* array, unsigned int rows,
                       unsigned int cols)
  {
    assert(M1._rows == cols && M1._cols == cols);
    std::vector<double> tmp(cols);
    for(unsigned int i = 0; i < rows; i++)
    {
      for(unsigned int r = 0; r < cols; r++)
      {
        double acc = 0.0;
        for(unsigned int c = 0; c < cols; c++)
          acc += array[i * cols + c] * M1(r, c);
        tmp[r] = acc;
      }
      for(unsigned int r = 0; r < cols; r++) array[i * cols + r] = tmp[r];
    }
  }

  /* Homogeneous point-set transform: rows = rows * R^T + t
   * (gsl/Matrix.cpp Matrix::transform).  Used by OutOfBoundsFilter2D. */
  void transform(Matrix T)
  {
    unsigned int dim = _cols;
    for(unsigned int i = 0; i < _rows; i++)
    {
      double p[3] = {0, 0, 0};
      for(unsigned int r = 0; r < dim; r++)
      {
        double acc = 0.0;
        for(unsigned int c = 0; c < dim; c++)
          acc += (*this)(i, c) * T(r, c);
        p[r] = acc;
      }
      for(unsigned int r = 0; r < dim; r++)
        (*this)(i, r) = p[r] + T(r, dim);
    }
  }

  /* LU solve with partial pivoting, destroying *this — mirrors
   * gsl_linalg_LU_decomp/LU_solve (gsl/Matrix.cpp:343-355).  Used by
   * PointToLine2DEstimator's 3x3 normal system. */
  void solve(double* b, double* x)
  {
    assert(_rows == _cols);
    unsigned int n = _rows;
    std::vector<double> rhs(b, b + n);
    for(unsigned int col = 0; col < n; col++)
    {
      unsigned int piv = col;
      for(unsigned int r = col + 1; r < n; r++)
        if(std::fabs((*this)(r, col)) > std::fabs((*this)(piv, col)))
          piv = r;
      if(piv != col)
      {
        for(unsigned int j = 0; j < n; j++)
        {
          double t = (*this)(col, j);
          (*this)(col, j) = (*this)(piv, j);
          (*this)(piv, j) = t;
        }
        double t = rhs[col];
        rhs[col] = rhs[piv];
        rhs[piv] = t;
      }
      double d = (*this)(col, col);
      assert(d != 0.0);
      for(unsigned int r = col + 1; r < n; r++)
      {
        double f = (*this)(r, col) / d;
        (*this)(r, col) = f;
        for(unsigned int j = col + 1; j < n; j++)
          (*this)(r, j) -= f * (*this)(col, j);
        rhs[r] -= f * rhs[col];
      }
    }
    for(int r = (int)n - 1; r >= 0; r--)
    {
      double acc = rhs[r];
      for(unsigned int j = r + 1; j < n; j++) acc -= (*this)(r, j) * x[j];
      x[r] = acc / (*this)(r, r);
    }
  }

  unsigned int getRows() const { return _rows; }
  unsigned int getCols() const { return _cols; }

  /* PCA of the point rows — replicates gsl/Matrix.cpp:227-326
   * (centroid, SVD of M^T M, per-axis extents/alignment, axes matrix
   * [dim, 2*dim]) via the closed-form symmetric 2x2 eigendecomposition
   * instead of gsl_linalg_SV_decomp_jacobi; eigenpairs sorted
   * descending like the jacobi SVD, directions agree up to sign (the
   * RANSAC callers normalize the sign, RandomMatching.cpp:123-135). */
  Matrix* pcaAnalysis() const
  {
    assert(_cols == 2);
    const unsigned int rows = _rows;
    const unsigned int dim = 2;
    Matrix* axes = new Matrix(dim, 2 * dim);

    double cent[2] = {0.0, 0.0};
    for(unsigned int i = 0; i < rows; i++)
    {
      cent[0] += (*this)(i, 0);
      cent[1] += (*this)(i, 1);
    }
    cent[0] /= (double)rows;
    cent[1] /= (double)rows;

    /* MtM of the centered points */
    double a = 0.0, b = 0.0, c = 0.0;
    for(unsigned int i = 0; i < rows; i++)
    {
      const double x = (*this)(i, 0) - cent[0];
      const double y = (*this)(i, 1) - cent[1];
      a += x * x;
      b += x * y;
      c += y * y;
    }

    /* eigenpairs of [[a, b], [b, c]], descending */
    const double tr = a + c;
    const double det = a * c - b * b;
    const double disc = std::sqrt(std::max(tr * tr / 4.0 - det, 0.0));
    const double l0 = tr / 2.0 + disc;
    const double l1 = tr / 2.0 - disc;
    double V[2][2];            /* V[j][i] = component j of eigvec i */
    if(std::fabs(b) > 1e-300)
    {
      double v0x = l0 - c, v0y = b;
      double n0 = std::sqrt(v0x * v0x + v0y * v0y);
      double v1x = l1 - c, v1y = b;
      double n1 = std::sqrt(v1x * v1x + v1y * v1y);
      V[0][0] = v0x / n0;
      V[1][0] = v0y / n0;
      V[0][1] = v1x / n1;
      V[1][1] = v1y / n1;
    }
    else if(a >= c)
    {
      V[0][0] = 1.0; V[1][0] = 0.0;
      V[0][1] = 0.0; V[1][1] = 1.0;
    }
    else
    {
      V[0][0] = 0.0; V[1][0] = 1.0;
      V[0][1] = 1.0; V[1][1] = 0.0;
    }

    /* per-axis extents in eigen coordinates + centroid alignment
     * (first loop adjusts cent for ALL axes, then axes are emitted) */
    double ext[2], align[2];
    for(unsigned int i = 0; i < dim; i++)
    {
      double mx = -1e300, mn = 1e300;
      for(unsigned int r = 0; r < rows; r++)
      {
        const double x = (*this)(r, 0) - cent[0];
        const double y = (*this)(r, 1) - cent[1];
        const double p = V[0][i] * x + V[1][i] * y;
        if(p > mx) mx = p;
        if(p < mn) mn = p;
      }
      ext[i] = mx - mn;
      align[i] = (ext[i] > 1e-6) ? (mx + mn) / 2.0 : 0.0;
    }
    for(unsigned int i = 0; i < dim; i++)
      for(unsigned int j = 0; j < dim; j++)
        cent[j] += V[j][i] * align[i];

    for(unsigned int i = 0; i < dim; i++)
      for(unsigned int j = 0; j < dim; j++)
      {
        const double e = V[j][i] * ext[i] / 2.0;
        (*axes)(i, 2 * j) = cent[j] - e;
        (*axes)(i, 2 * j + 1) = cent[j] + e;
      }
    return axes;
  }

  void print() const
  {
    for(unsigned int r = 0; r < _rows; r++)
    {
      for(unsigned int c = 0; c < _cols; c++)
        std::printf("%g ", (*this)(r, c));
      std::printf("\n");
    }
  }

private:
  unsigned int _rows;
  unsigned int _cols;
  double* _data;
};

/* Vector: declared for API completeness (linalg.h exports it); the
 * grid/raycast subset never instantiates one. */
class Vector
{
public:
  explicit Vector(unsigned int n) : _n(n), _data(new double[n]())
  {
  }
  ~Vector() { delete[] _data; }
  double& operator()(unsigned int i) { return _data[i]; }
  unsigned int getSize() const { return _n; }

private:
  Vector(const Vector&);
  Vector& operator=(const Vector&);
  unsigned int _n;
  double* _data;
};

/* MatrixFactory subset: SE(2) transform constructor (used by the harness
 * itself to build poses; reference: MatrixFactory.cpp). */
class MatrixFactory
{
public:
  static Matrix TransformationMatrix33(double phi, double tx, double ty)
  {
    Matrix T(3, 3);
    T.setIdentity();
    T(0, 0) = std::cos(phi);
    T(0, 1) = -std::sin(phi);
    T(1, 0) = std::sin(phi);
    T(1, 1) = std::cos(phi);
    T(0, 2) = tx;
    T(1, 2) = ty;
    return T;
  }
};

} // namespace obvious

#endif
