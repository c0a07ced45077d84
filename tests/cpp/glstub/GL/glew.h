// Test-only GL stub: just enough typedefs/constants/functions for the
// reference headers to parse when compiling erosion.cpp standalone as a
// golden-value oracle (no GL calls are ever executed on erosion paths).
#pragma once
#include <cstddef>
typedef unsigned int GLenum; typedef unsigned int GLuint; typedef int GLint;
typedef float GLfloat; typedef double GLdouble; typedef unsigned char GLboolean;
typedef int GLsizei; typedef unsigned char GLubyte; typedef void GLvoid;
typedef char GLchar; typedef std::ptrdiff_t GLintptr; typedef std::ptrdiff_t GLsizeiptr;
typedef unsigned short GLushort; typedef short GLshort; typedef unsigned int GLbitfield;
typedef signed char GLbyte; typedef double GLclampd; typedef float GLclampf;
typedef unsigned long long GLuint64; typedef long long GLint64;
static inline int glutGet(int) { return 0; }
#define GLUT_ELAPSED_TIME 0x0000
#define GL_TRIANGLES 0x0004
#define GL_TRIANGLE_STRIP 0x0005
#define GL_TRIANGLE_FAN 0x0006
#define GL_QUADS 0x0007
#define GL_POINTS 0x0000
#define GL_LINES 0x0001
#define GL_UNSIGNED_BYTE 0x1401
#define GL_UNSIGNED_SHORT 0x1403
#define GL_UNSIGNED_INT 0x1405
#define GL_FLOAT 0x1406
#define GL_RED 0x1903
#define GL_RGB 0x1907
#define GL_RGBA 0x1908
#define GL_LUMINANCE 0x1909
#define GL_BGR 0x80E0
#define GL_BGRA 0x80E1
#define GL_TEXTURE_2D_ARRAY 0x8C1A
#define GL_TEXTURE_2D_MULTISAMPLE 0x9100
#define GL_TEXTURE_2D_MULTISAMPLE_ARRAY 0x9102
#define GL_DEBUG_SOURCE_APPLICATION 0x824A
static inline void glPushDebugGroup(unsigned, unsigned, int, char const*) {}
static inline void glPopDebugGroup() {}
#define GL_RG 0x8227
#define GL_RG8 0x822B
#define GL_RG16 0x822C
#define GL_R8 0x8229
#define GL_R16 0x822A
#define GL_RGB8 0x8051
#define GL_RGBA8 0x8058
#define GL_COMPRESSED_RGB 0x84ED
#define GL_COMPRESSED_RGBA 0x84EE
#define GL_TEXTURE_2D 0x0DE1
#define GL_MODELVIEW 0x1700
#define GL_PROJECTION 0x1701
static inline void glDrawArrays(GLenum, GLint, GLsizei) {}
static inline void glDrawRangeElements(GLenum, GLuint, GLuint, GLsizei, GLenum, const void*) {}
